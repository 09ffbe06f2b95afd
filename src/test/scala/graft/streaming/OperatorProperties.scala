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
}
