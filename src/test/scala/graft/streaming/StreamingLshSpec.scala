package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** StreamingLsh: incremental minhash-LSH candidates. Verified four
  * ways: batch run ≡ an independent driver-side derivation of the
  * online keep-first rule on real testdata; chunked streaming replay ≡
  * the batch candidate set WITH at least one cross-batch hit (state
  * carry); the bridge fixture pins the documented divergence from
  * offline union-find (a late bridging doc merges nothing
  * retroactively); and retention eviction re-anchors an aged bucket.
  */
class StreamingLshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = "/root/testdata/sf0.001"
  private val DayMs = 24L * 3600 * 1000

  /** sf0.001 docs as an ingest stream; arrival time = (doc_id + 1)
    * minutes — distinct, ordered, and strictly above the engine's
    * initial watermark of 0 (an event AT the watermark is late and
    * silently dropped, which is a replay-harness artifact, not an
    * operator property). */
  private lazy val docEvents: Seq[DocEvent] =
    spark.read.parquet(s"$D/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => DocEvent(r.getLong(0), (r.getLong(0) + 1) * 60000L,
        r.getString(1)))
      .toSeq

  /** The online keep-first rule, stated independently: per bucket in
    * (ts, docId) order, first row anchors, later rows of OTHER docs
    * emit (anchor, doc). */
  private def derive(bands: Seq[BandRow]): Set[(Long, Long, Long, Long)] =
    bands.groupBy(b => (b.h1, b.h2)).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r.ts, r.docId))
      val (ad, ats) = (sorted.head.docId, sorted.head.ts)
      sorted.tail.filter(_.docId != ad).map(r => (ad, ats, r.docId, r.ts))
    }.toSet

  private def bandRows(docs: Seq[DocEvent]): Seq[BandRow] =
    docs.flatMap { e =>
      val g = StreamingLsh.signature(e.text)
      Seq(BandRow(g(0), g(1), e.docId, e.ts), BandRow(g(2), g(3), e.docId, e.ts))
    }

  test("batch candidates ≡ the independent online keep-first derivation") {
    val want = derive(bandRows(docEvents))
    val got = StreamingLsh.candidates(docEvents.toDS()).collect()
      .map(c => (c.anchorDoc, c.anchorTs, c.docId, c.ts)).toSet
    assert(got == want)
    assert(want.nonEmpty, "the corpus has near-dup candidates")
  }

  test("chunked streaming replay ≡ batch, including cross-batch hits") {
    implicit val sqlCtx = spark.sqlContext
    val sorted = docEvents.sortBy(_.ts)
    val chunks = sorted.grouped(math.max(1, sorted.size / 5)).toSeq
    val mem = MemoryStream[DocEvent]
    val q = StreamingLsh.candidatesFromBands(
        Dedup.withMsWatermark(StreamingLsh.bandsOf(mem.toDS())))
      .writeStream.format("memory").queryName("lsh_out")
      .outputMode(OutputMode.Append).start()
    try {
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val got = spark.table("lsh_out").as[LshCandidate].collect()
      val batch = StreamingLsh.candidates(docEvents.toDS()).collect()
      assert(got.map(c => (c.anchorDoc, c.docId, c.h1, c.h2)).toSet ==
        batch.map(c => (c.anchorDoc, c.docId, c.h1, c.h2)).toSet)
      // state carry: some candidate's anchor arrived in an earlier chunk
      val chunkOf = chunks.zipWithIndex.flatMap { case (c, i) =>
        c.map(_.docId -> i) }.toMap
      assert(got.exists(c => chunkOf(c.anchorDoc) < chunkOf(c.docId)),
        "no candidate crossed a micro-batch boundary")
    } finally q.stop()
  }

  test("bridge fixture: a late doc never merges earlier singletons") {
    // D1 claims x, D2 claims y, D3 lands in both — online rule pairs
    // D3 twice and keeps BOTH D1 and D2 (union-find would keep only D1)
    val bands = Seq(
      BandRow(1L, 1L, 10L, 1000L), // D1 in x
      BandRow(9L, 9L, 10L, 1000L),
      BandRow(2L, 2L, 20L, 2000L), // D2 in y
      BandRow(8L, 8L, 20L, 2000L),
      BandRow(1L, 1L, 30L, 3000L), // D3 bridges x and y
      BandRow(2L, 2L, 30L, 3000L))
    val got = StreamingLsh.candidatesFromBands(bands.toDS()).collect()
      .map(c => (c.anchorDoc, c.docId)).toSet
    assert(got == Set((10L, 30L), (20L, 30L)))
    // self-coincident bands: one doc occupying a bucket twice is not
    // its own candidate
    val self = Seq(BandRow(5L, 5L, 40L, 1000L), BandRow(5L, 5L, 40L, 1000L))
    assert(StreamingLsh.candidatesFromBands(self.toDS()).collect().isEmpty)
  }

  test("retention evicts an aged anchor; the bucket re-anchors") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BandRow]
    val q = StreamingLsh.candidatesFromBands(
        Dedup.withMsWatermark(mem.toDS()), retentionMs = 7L * DayMs)
      .writeStream.format("memory").queryName("lsh_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(BandRow(1L, 1L, 100L, DayMs)) // anchor at T=1d
      q.processAllAvailable()
      // the live anchor pairs — proves it was not dropped as late
      mem.addData(BandRow(1L, 1L, 99L, DayMs + 1000L))
      q.processAllAvailable()
      // advance the watermark far past T + retention (other bucket),
      // then trigger again so the timer fires and reaps the anchor
      mem.addData(BandRow(2L, 2L, 101L, 60L * DayMs))
      q.processAllAvailable()
      mem.addData(BandRow(3L, 3L, 102L, 61L * DayMs))
      q.processAllAvailable()
      // same bucket, new doc: state was reaped → re-anchor, no pair
      mem.addData(BandRow(1L, 1L, 103L, 62L * DayMs))
      q.processAllAvailable()
      // and the re-anchored bucket claims again from the NEW doc
      mem.addData(BandRow(1L, 1L, 104L, 62L * DayMs + 1000L))
      q.processAllAvailable()
      val got = spark.table("lsh_ttl").as[LshCandidate].collect()
        .map(c => (c.anchorDoc, c.docId)).toSet
      assert(got == Set((100L, 99L), (103L, 104L)),
        "live anchor pairs once; aged-out anchor re-anchors instead of pairing")
    } finally q.stop()
  }
}
