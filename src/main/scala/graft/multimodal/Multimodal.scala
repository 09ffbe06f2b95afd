package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: media as opaque `binary` columns with typed metadata, and
  * the decode / feature-extract / resize / frame-sample stages as
  * partition-batched operators.
  *
  * Image decode is REAL for the formats the JDK itself can read
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — no external libraries):
  * [[JvmImageCodec]] parses the payload bytes and emits true
  * width/height/RGB pixels. Payloads ImageIO cannot parse (raw blobs,
  * audio, video containers) fall back to `StubCodec`, which derives
  * deterministic fake pixels/samples from the bytes, so every pipeline
  * stage stays fully testable and the Spark plumbing — schema, partition
  * batching, operator signatures, output shapes — is identical either
  * way. Audio decode is REAL for the WAV/AIFF/AU family
  * (`javax.sound.sampled`, [[JvmAudioCodec]]) with the same stub
  * fallback. Video container METADATA is real for the MP4/ISO-BMFF
  * family ([[Mp4Probe]] — a plain box-tree walk, no codec needed);
  * animated-GIF frame-pixel decode + per-frame timestamps are real
  * ([[JvmGifFrames]]); only compressed-video (mp4/webm) frame pixels
  * and compressed-audio (mp3/ogg) codecs remain stubbed (no libs in
  * this container).
  *
  * Scale notes (100 TB of media):
  *  - rows carry bytes, so `spark.sql.files.maxPartitionBytes` (not row
  *    count) governs scan partitioning; [[repartitionForDecode]] rebalances
  *    by byte size before the CPU-heavy decode;
  *  - decode runs via `mapPartitions` — one codec init per partition, the
  *    JVM analog of `mapInPandas` batch processing;
  *  - features are `Array[Float]` columns that flow straight into the
  *    similarity-search operators (graft.queries.VectorOps).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, media_type: String, uri: String,
      bytes: Array[Byte], width: Int, height: Int, duration_ms: Long)

  case class DecodedImage(media_id: Long, width: Int, height: Int,
      channels: Int, pixels: Array[Byte])

  case class MediaFeatures(media_id: Long, media_type: String,
      embedding: Array[Float])

  case class DecodedAudio(media_id: Long, sample_rate: Int, channels: Int,
      n_frames: Int, samples: Array[Float])

  case class VideoFrame(media_id: Long, frame_index: Int, ts_ms: Long,
      pixels: Array[Byte])

  /** Deterministic fake codec — replace with a real decoder at the ONE
    * marked point per op. Derivation is a rolling FNV-1a over the bytes,
    * so outputs are stable across runs/partitionings. */
  object StubCodec {
    private def fnv(bytes: Array[Byte], seed: Long): Long = {
      var h = 0xcbf29ce484222325L ^ seed
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h
    }

    /** STUB — real impl: javax.imageio / libjpeg binding. */
    def decodeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte]((w * h * 3).max(0))
      var i = 0
      var acc = fnv(bytes, 0x1337)
      while (i < out.length) {
        acc = acc * 6364136223846793005L + 1442695040888963407L
        out(i) = (acc >>> 56).toByte
        i += 1
      }
      out
    }

    /** STUB — real impl: a resampling kernel over decoded pixels. */
    def resize(pixels: Array[Byte], sw: Int, sh: Int, tw: Int, th: Int)
        : Array[Byte] = {
      val out = new Array[Byte](tw * th * 3)
      var y = 0
      while (y < th) {
        var x = 0
        while (x < tw) {
          val sx = x * sw / tw.max(1)
          val sy = y * sh / th.max(1)
          var c = 0
          while (c < 3) {
            val si = (sy * sw + sx) * 3 + c
            out((y * tw + x) * 3 + c) = if (si < pixels.length) pixels(si) else 0
            c += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }

    /** STUB — real impl: a vision/audio encoder. Deterministic projection
      * of the payload into a unit-norm float vector. */
    def extractFeatures(bytes: Array[Byte], dims: Int): Array[Float] = {
      val v = new Array[Float](dims)
      var i = 0
      while (i < dims) {
        val h = fnv(bytes, i.toLong * 0x9e3779b97f4a7c15L)
        v(i) = ((h >> 11).toDouble / (1L << 52).toDouble).toFloat
        i += 1
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).max(1e-9)
      v.map(x => (x / n).toFloat)
    }

    /** STUB — real impl: an audio decoder for non-WAV containers
      * (mp3/ogg/flac need external libs). Deterministic samples in
      * [−1, 1] derived from the payload bytes. */
    def decodeAudio(bytes: Array[Byte], n: Int): Array[Float] = {
      val out = new Array[Float](n)
      var acc = fnv(bytes, 0xA0D10L)
      var i = 0
      while (i < n) {
        acc = acc * 6364136223846793005L + 1442695040888963407L
        out(i) = ((acc >> 11).toDouble / (1L << 52).toDouble).toFloat
        i += 1
      }
      out
    }

    /** STUB — real impl: container demux + keyframe decode. */
    def sampleFrame(bytes: Array[Byte], frameIdx: Int, w: Int, h: Int)
        : Array[Byte] =
      decodeImage(bytes ++ BigInt(frameIdx).toByteArray, w, h)
  }

  /** Real pure-JVM image codec. `javax.imageio` ships PNG/BMP/GIF/JPEG
    * readers inside the JDK, so decode needs no external dependency.
    * Returns None for payloads ImageIO cannot parse — the caller falls
    * back to [[StubCodec]], keeping the operator total over arbitrary
    * binary columns (a 100 TB crawl always contains corrupt media). */
  object JvmImageCodec {
    final case class Image(width: Int, height: Int, pixels: Array[Byte])

    /** BufferedImage → RGB row-major pixel buffer (3 bytes/pixel). */
    private[multimodal] def toImage(img: java.awt.image.BufferedImage): Image = {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val o = (y * w + x) * 3
          out(o) = ((rgb >> 16) & 0xff).toByte
          out(o + 1) = ((rgb >> 8) & 0xff).toByte
          out(o + 2) = (rgb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Image(w, h, out)
    }

    /** bytes → RGB row-major pixel buffer (3 bytes/pixel), or None. */
    def decode(bytes: Array[Byte]): Option[Image] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) None else Some(toImage(img))
      } catch { case _: java.io.IOException => None }
  }

  /** Real pure-JVM MULTI-frame decode for animated GIF — the one video-
    * like container the JDK can fully demux AND pixel-decode without
    * external codecs (ImageIO's GIF reader exposes every stored frame
    * plus its GraphicControlExtension delay). Frames are returned as the
    * raw stored rectangles with cumulative presentation timestamps;
    * disposal-method compositing is NOT applied (a feature-extraction
    * pipeline samples frames, it doesn't replay the animation). Returns
    * None for anything that is not a parseable GIF — callers fall back
    * to the Mp4Probe-metadata + stub-pixel path, the same totality
    * pattern as the other codecs. */
  object JvmGifFrames {
    final case class Frame(index: Int, tsMs: Long, image: JvmImageCodec.Image)

    private def delayMs(meta: javax.imageio.metadata.IIOMetadata): Long =
      try {
        val tree = meta.getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val nodes = tree.getElementsByTagName("GraphicControlExtension")
        if (nodes.getLength == 0) 0L
        else nodes.item(0).asInstanceOf[org.w3c.dom.Element]
          .getAttribute("delayTime").toLong * 10L // centiseconds → ms
      } catch { case scala.util.control.NonFatal(_) => 0L }

    def decode(bytes: Array[Byte]): Option[Vector[Frame]] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        var gif: javax.imageio.ImageReader = null
        while (gif == null && readers.hasNext) {
          val r = readers.next()
          if (r.getFormatName.equalsIgnoreCase("gif")) gif = r
        }
        if (gif == null) None
        else try {
          gif.setInput(iis)
          val n = gif.getNumImages(true)
          if (n <= 0) None
          else {
            var ts = 0L
            val frames = Vector.tabulate(n) { i =>
              val f = Frame(i, ts, JvmImageCodec.toImage(gif.read(i)))
              ts += delayMs(gif.getImageMetadata(i))
              f
            }
            Some(frames)
          }
        } finally gif.dispose()
      } catch { case scala.util.control.NonFatal(_) => None }
      finally iis.close()
    }
  }

  /** Real pure-JVM audio codec. `javax.sound.sampled` ships WAV/AIFF/AU
    * readers inside the JDK — the one audio format family decodable with
    * no external dependency. Returns None for payloads AudioSystem
    * cannot parse (mp3/ogg/raw blobs) or encodings outside plain PCM —
    * the caller falls back to [[StubCodec]], the same totality pattern
    * as [[JvmImageCodec]]. */
  object JvmAudioCodec {
    final case class Audio(sampleRate: Int, channels: Int,
        samples: Array[Float])

    /** bytes → interleaved float samples in [−1, 1), or None. Handles
      * PCM_SIGNED 16-bit (either endianness) and PCM_UNSIGNED 8-bit —
      * the encodings real-world WAV files overwhelmingly use. */
    def decode(bytes: Array[Byte]): Option[Audio] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
          val bits = fmt.getSampleSizeInBits
          val ok = (fmt.getEncoding == PCM_SIGNED && bits == 16) ||
            (fmt.getEncoding == PCM_UNSIGNED && bits == 8)
          if (!ok) None
          else {
            val data = in.readAllBytes()
            val samples =
              if (bits == 8) data.map(b => ((b & 0xff) - 128) / 128.0f)
              else {
                val n = data.length / 2
                val arr = new Array[Float](n)
                var i = 0
                while (i < n) {
                  val s =
                    if (fmt.isBigEndian)
                      ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort
                    else
                      ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
                  arr(i) = s / 32768.0f
                  i += 1
                }
                arr
              }
            Some(Audio(fmt.getSampleRate.toInt, fmt.getChannels, samples))
          }
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
  }

  /** Real pure-JVM video CONTAINER parser for the MP4/ISO-BMFF family
    * (mp4/m4a/mov/3gp — the overwhelming majority of crawled video).
    * Frame DECODE needs codec libraries this container doesn't have, but
    * container metadata does not: an ISO-BMFF file is a tree of
    * [size|fourcc|payload] boxes, so duration (mvhd timescale+duration),
    * track dimensions (tkhd 16.16 fixed-point), track count and media
    * kinds (hdlr 'vide'/'soun') parse with nothing but big-endian reads.
    * Returns None unless the byte stream is structurally valid boxes AND
    * carries an ftyp brand or an mvhd — random/corrupt payloads fail the
    * walk (a bogus size overruns the buffer) and fall back to declared
    * metadata, the same totality pattern as the image/audio codecs. */
  object Mp4Probe {
    final case class VideoMeta(majorBrand: String, durationMs: Long,
        width: Int, height: Int, nTracks: Int,
        hasVideo: Boolean, hasAudio: Boolean)

    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def be64(b: Array[Byte], o: Int): Long =
      (be32(b, o) << 32) | be32(b, o + 4)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

    def probe(bytes: Array[Byte]): Option[VideoMeta] = {
      if (bytes == null || bytes.length < 8) return None
      var brand: String = ""
      var timescale = 0L
      var duration = 0L
      var w = 0
      var h = 0
      var tracks = 0
      var hasV = false
      var hasA = false
      // walk one container's children; false = structurally invalid
      def walk(start: Int, end: Int, depth: Int): Boolean = {
        var off = start
        while (off + 8 <= end) {
          var size = be32(bytes, off)
          val typ = fourcc(bytes, off + 4)
          var hdr = 8
          if (size == 1) {
            if (off + 16 > end) return false
            size = be64(bytes, off + 8); hdr = 16
          } else if (size == 0) size = (end - off).toLong // box runs to EOF
          if (size < hdr || size > end - off) return false
          val p = off + hdr
          typ match {
            case "ftyp" if size >= hdr + 4 =>
              brand = fourcc(bytes, p)
            case "moov" | "trak" | "mdia" if depth < 4 =>
              if (typ == "trak") tracks += 1
              if (!walk(p, off + size.toInt, depth + 1)) return false
            case "mvhd" if size >= hdr + 4 =>
              val v = bytes(p) & 0xff
              if (v == 1 && size >= hdr + 28) {
                timescale = be32(bytes, p + 20)
                duration = be64(bytes, p + 24)
              } else if (v == 0 && size >= hdr + 20) {
                timescale = be32(bytes, p + 12)
                duration = be32(bytes, p + 16)
              }
            case "tkhd" if size >= hdr + 4 =>
              val v = bytes(p) & 0xff
              val wOff = if (v == 1) 88 else 76 // spec layout, see scaladoc
              if (size >= hdr + wOff + 8 && w == 0 && h == 0) {
                val tw = (be32(bytes, p + wOff) >> 16).toInt     // 16.16
                val th = (be32(bytes, p + wOff + 4) >> 16).toInt
                if (tw > 0 && th > 0) { w = tw; h = th }
              }
            case "hdlr" if size >= hdr + 12 =>
              fourcc(bytes, p + 8) match {
                case "vide" => hasV = true
                case "soun" => hasA = true
                case _      => ()
              }
            case _ => () // mdat, free, udta, ... skipped, not descended
          }
          off += size.toInt
        }
        off == end
      }
      if (!walk(0, bytes.length, 0)) None
      else if (brand.isEmpty && timescale == 0) None // valid boxes, not BMFF
      else Some(VideoMeta(brand,
        if (timescale > 0) duration * 1000L / timescale else 0L,
        w, h, tracks, hasV, hasA))
    }
  }

  case class VideoProbe(media_id: Long, container_parsed: Boolean,
      major_brand: String, duration_ms: Long, width: Int, height: Int,
      n_tracks: Int, has_video: Boolean, has_audio: Boolean)

  /** Video probe stage: binary → container metadata from the BITSTREAM
    * via [[Mp4Probe]] (duration, dimensions, track kinds), falling back
    * to the row's declared metadata with `container_parsed = false`.
    * Same mapPartitions batch shape as the decode stages. */
  def probeVideos(media: Dataset[MediaRow]): Dataset[VideoProbe] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").mapPartitions(_.map { r =>
      Mp4Probe.probe(r.bytes) match {
        case Some(m) => VideoProbe(r.media_id, container_parsed = true,
          m.majorBrand, m.durationMs, m.width, m.height, m.nTracks,
          m.hasVideo, m.hasAudio)
        case None => VideoProbe(r.media_id, container_parsed = false,
          "", r.duration_ms, r.width, r.height, 0,
          has_video = false, has_audio = false)
      }
    })
  }

  /** Rebalance by payload size before CPU-heavy stages: target ~`mb` MB of
    * media bytes per partition regardless of row skew. */
  def repartitionForDecode(df: DataFrame, mb: Int = 64): DataFrame = {
    val totalBytes = Option(df.agg(sum(length(col("bytes")))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L).max(1L) // empty frame → sum is null
    val parts = math.max(1, (totalBytes / (mb.toLong << 20)).toInt)
    df.repartition(parts)
  }

  /** Decode stage: binary → pixel buffers, one codec init per partition
    * (mapPartitions ≡ mapInPandas batch shape). Real decode via
    * [[JvmImageCodec]] when the bytes are a parseable image — width and
    * height then come from the BITSTREAM, not the declared metadata —
    * with the deterministic stub as fallback for unparseable payloads. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "image").mapPartitions { rows =>
      // per-partition codec init: disable ImageIO's disk-backed stream
      // cache so decode stays in-memory on executors
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        JvmImageCodec.decode(r.bytes) match {
          case Some(img) =>
            DecodedImage(r.media_id, img.width, img.height, 3, img.pixels)
          case None =>
            DecodedImage(r.media_id, r.width, r.height, 3,
              StubCodec.decodeImage(r.bytes, r.width, r.height))
        }
      }
    }
  }

  /** Audio decode stage: binary → interleaved float samples, same
    * mapPartitions batch shape and stub-fallback totality as
    * [[decodeImages]]. Sample rate / channel count / samples come from
    * the WAV BITSTREAM when parseable, never from declared metadata. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "audio").mapPartitions(_.map { r =>
      JvmAudioCodec.decode(r.bytes) match {
        case Some(a) =>
          DecodedAudio(r.media_id, a.sampleRate, a.channels,
            a.samples.length / a.channels.max(1), a.samples)
        case None =>
          val n = 64
          DecodedAudio(r.media_id, 8000, 1, n, StubCodec.decodeAudio(r.bytes, n))
      }
    })
  }

  /** Resize stage over decoded images. */
  def resizeImages(imgs: Dataset[DecodedImage], tw: Int, th: Int)
      : Dataset[DecodedImage] = {
    import imgs.sparkSession.implicits._
    imgs.mapPartitions(_.map(i => DecodedImage(i.media_id, tw, th, i.channels,
      StubCodec.resize(i.pixels, i.width, i.height, tw, th))))
  }

  /** Feature extraction: any media type → unit-norm embedding, ready for
    * the VectorOps similarity operators. */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 64)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => MediaFeatures(r.media_id, r.media_type,
      StubCodec.extractFeatures(r.bytes, dims))))
  }

  /** Frame sampling: every video → `n` evenly spaced frames (flatMap —
    * one input row fans out to n). Three fidelity tiers, best available
    * per payload: animated GIF → REAL pixel frames + REAL per-frame
    * presentation timestamps ([[JvmGifFrames]] — the one container the
    * JDK can both demux and pixel-decode); ISO-BMFF → REAL container
    * duration for the timestamps ([[Mp4Probe]]), stub pixels (mp4 frame
    * decode needs codec libs); anything else → declared duration + stub
    * pixels. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      JvmGifFrames.decode(r.bytes) match {
        case Some(frames) =>
          (0 until n).map { i =>
            val idx = if (n <= 1) 0 else (frames.size - 1).toLong * i / (n - 1)
            val f = frames(idx.toInt)
            VideoFrame(r.media_id, i, f.tsMs, f.image.pixels)
          }
        case None =>
          val dur = Mp4Probe.probe(r.bytes).map(_.durationMs)
            .getOrElse(r.duration_ms)
          (0 until n).map { i =>
            val ts = if (n <= 1) 0L else dur * i / (n - 1)
            VideoFrame(r.media_id, i, ts,
              StubCodec.sampleFrame(r.bytes, i, r.width, r.height))
          }
      }
    }
  }

  /** Synthetic media table for tests/demos (deterministic from seed). */
  def syntheticMedia(spark: SparkSession, rows: Int, seed: Long = 42L)
      : Dataset[MediaRow] = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until rows).map { i =>
      val mt = Seq("image", "audio", "video")(i % 3)
      val bytes = new Array[Byte](64 + rnd.nextInt(192))
      rnd.nextBytes(bytes)
      MediaRow(i.toLong, mt, s"mem://media/$i", bytes,
        width = 8 + (i % 4) * 4, height = 8 + (i % 3) * 4,
        duration_ms = if (mt == "video") 1000L + i else 0L)
    }.toDS()
  }
}
