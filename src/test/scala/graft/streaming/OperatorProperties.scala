package graft.streaming

import graft.functions.Tokenize
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure operator logic (no SparkSession —
  * these laws must hold for the closures the distributed operators ship
  * to executors). */
object OperatorProperties extends Properties("graft.operators") {

  private val word = Gen.alphaLowerStr.suchThat(_.nonEmpty)

  property("tokenize is insensitive to surrounding punctuation") =
    Prop.forAll(Gen.nonEmptyListOf(word)) { ws =>
      val plain = Tokenize.split(ws.mkString(" "))
      val noisy = Tokenize.split(ws.mkString("  ,") + "!!")
      plain == noisy
    }

  property("tokenize lowercases latin runs") =
    Prop.forAll(word) { w =>
      Tokenize.split(w.toUpperCase) == Seq(w.toLowerCase)
    }

  property("CJK runs emit n-1 bigrams (n>1)") =
    Prop.forAll(Gen.chooseNum(2, 8)) { n =>
      val run = "数" * n
      Tokenize.split(run).size == n - 1
    }

  property("dateOf is stable across the day") =
    Prop.forAll(Gen.chooseNum(0L, 24L * 3600 * 1000 - 1)) { off =>
      val day = 19000L * 24 * 3600 * 1000
      Dedup.dateOf(day + off) == Dedup.dateOf(day)
    }

  property("dateOf changes exactly at midnight UTC") =
    Prop.forAll(Gen.chooseNum(1L, 10000L)) { d =>
      val t = d * 24L * 3600 * 1000
      Dedup.dateOf(t - 1) != Dedup.dateOf(t)
    }

  property("multimodal feature extraction is pure") =
    Prop.forAll(Gen.listOfN(32, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val a = graft.multimodal.Multimodal.StubCodec.extractFeatures(bs.toArray, 16)
      val b = graft.multimodal.Multimodal.StubCodec.extractFeatures(bs.toArray, 16)
      a.sameElements(b)
    }

  // GramHash: the one-pass text-slice loop must equal hashing the
  // materialized gram strings for ANY token sequence (the law the q113/
  // q116/q119/q31-family oracles rest on). Words include empty tokens
  // (consecutive-space artifacts) and non-ascii codepoints.
  private val gramWord =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(12)), Gen.const(""),
      Gen.nonEmptyListOf(Gen.oneOf('ä', 'ß', '数', 'x')).map(_.mkString.take(6)))

  private def refGramHashes(text: String, n: Int): Seq[Long] = {
    val P = graft.functions.GramHash.P
    val B = graft.functions.GramHash.Base
    val toks = text.split(" ", -1)
    if (toks.length < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ").codePoints().toArray
      .foldLeft(0L)((acc, c) => (acc * B % P + (c % 256)) % P)).toSeq
  }

  property("gram_hashes equals hashing materialized gram strings") =
    Prop.forAll(Gen.listOfN(12, gramWord), Gen.chooseNum(1, 9)) { (ws, n) =>
      val text = ws.mkString(" ")
      val native = graft.functions.GramHash
        .hashes(org.apache.spark.unsafe.types.UTF8String.fromString(text), n)
        .toLongArray().toSeq
      native == refGramHashes(text, n)
    }
}
