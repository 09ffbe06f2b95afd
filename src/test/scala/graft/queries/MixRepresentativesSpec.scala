package graft.queries

import graft.TestSpark
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** q150/q151 invariants beyond the oracle rows. */
class MixRepresentativesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeDocs(dir: String, docs: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    docs.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
  }

  test("q150 temperature mixing flattens the source distribution") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mix").toString
    // 400 / 100 / 4 docs -> sqrt weights 20 / 10 / 2
    val docs =
      (0L until 400L).map(i => (i, "big", s"w$i x y z")) ++
      (400L until 500L).map(i => (i, "mid", s"w$i x y z")) ++
      (500L until 504L).map(i => (i, "tiny", s"w$i x y z"))
    writeDocs(dir, docs)
    val got = CurationOps.temperatureMix(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    val (nB, wB, shareB, _, _, sampB) = got("big")
    val (nM, wM, shareM, _, _, _) = got("mid")
    val (nT, wT, shareT, _, _, _) = got("tiny")
    assert((wB, wM, wT) == ((20L, 10L, 2L)), "floor(sqrt(n)) weights")
    assert(shareB == 20L * 1000000L / 32L && shareM == 10L * 1000000L / 32L
      && shareT == 2L * 1000000L / 32L)
    // flattening: the big source's sampled share is BELOW its doc
    // share, the tiny source's above (the whole point of temperature)
    assert(shareB * (nB + nM + nT) < nB * 1000000L)
    assert(shareT * (nB + nM + nT) > nT * 1000000L)
    got.values.foreach { case (n, _, _, target, rate, sampled) =>
      assert(target <= n && sampled <= n)
      if (rate == 1000000L) assert(sampled == n, "rate 1 keeps everything")
    }
    // the sampler tracks its target (hash-uniformity; generous band)
    assert(sampB > 0L)
  }

  test("q153 upsamples the tiny source and matches a driver re-derivation") {
    import org.apache.spark.unsafe.types.UTF8String
    val dir = java.nio.file.Files.createTempDirectory("graft_epoch").toString
    val docs =
      (0L until 400L).map(i => (i, "big", s"w$i x y z")) ++
      (400L until 500L).map(i => (i, "mid", s"w$i x y z")) ++
      (500L until 504L).map(i => (i, "tiny", s"w$i x y z"))
    writeDocs(dir, docs)
    // full driver-side re-derivation, native hash included
    val n = Map("big" -> 400L, "mid" -> 100L, "tiny" -> 4L)
    val w = n.view.mapValues(v => math.sqrt(v.toDouble).toLong).toMap
    val (wTot, nTot) = (w.values.sum, n.values.sum)
    def hashPpm(id: Long): Long = graft.functions.GramHash
      .hashes(UTF8String.fromString(s"$id:mix"), 1).getLong(0) % 1000000L
    val want = n.keys.map { src =>
      val target = (w(src) * 1000000L / wTot) * (nTot / 2) / 1000000L
      val base = target / n(src)
      val frac = (target * 1000000L / n(src)) % 1000000L
      val ids = docs.filter(_._2 == src).map(_._1)
      src -> (n(src), target, base,
        ids.map(i => base + (if (hashPpm(i) < frac) 1L else 0L)).sum)
    }.toMap
    val got = CurationOps.epochRealize(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
    assert(got("tiny")._3 >= 1L, "tiny source upsampled past 1x")
    assert(got("big")._3 == 0L, "big source subsampled (base 0)")
    val (_, target, _, realized) = got("tiny")
    assert(math.abs(realized - target) <= n("tiny"),
      "realization tracks the target within one repeat per doc")
  }

  test("q151 keeps the highest-quality member, not the min-id (q110 convention)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    writeDocs(dir, Seq(
      // doc 2: same token SET as doc 5 (identical minhash signatures,
      // Jaccard 100%) but one duplicated token -> LOWER diversity
      (2L, "src", base + " tok1"),
      (5L, "src", base),
      // unrelated doc: no pair, must not appear
      (9L, "src", (1 to 40).map(i => s"zz$i").mkString(" "))))
    val q110 = Advanced.minhashDedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(q110(2L) == ((2L, true)) && q110(5L) == ((2L, false)),
      "min-id convention keeps doc 2")
    val got = Advanced.clusterRepresentatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 2L, 5L, 1000000L)),
      s"quality-aware selection keeps doc 5 (diversity 1.0), got ${got.toSeq}")
  }

  test("q211 yield curve ≡ q110 clusters + token census (composition)") {
    val sf = "/root/testdata/sf0.001"
    val clusters = Advanced.minhashDedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val byCluster = clusters.groupBy(_._2).toSeq.map { case (rep, ms) =>
      (ms.length.toLong, ms.map(m => toks(m._1)).sum
        - ms.filter(_._3).map(m => toks(m._1)).sum)
    }
    val exp = byCluster.groupBy(_._1).map { case (sz, cs) =>
      sz -> ((cs.length.toLong, (sz - 1) * cs.length, cs.map(_._2).sum))
    }
    val got = Advanced.clusterYield(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == exp)
    // every cluster here is a real one (size >= 2)
    assert(got.keys.forall(_ >= 2L))
  }

  test("q227 quality-mass: kept mass crosses 90% with the boundary doc; " +
    "≡ driver head selection") {
    val sf = "/root/testdata/sf0.001"
    val qual = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source", "split(text, ' ') AS w").collect()
      .map { r =>
        val ws = r.getSeq[String](2)
        (r.getString(1), r.getLong(0),
          ws.distinct.length.toLong * 1000000L / ws.length)
      }
    val exp = qual.groupBy(_._1).view.mapValues { ds =>
      val sorted = ds.sortBy(d => (-d._3, d._2))
      val total = sorted.map(_._3).sum
      var before = 0L
      val kept = sorted.takeWhile { d =>
        val in = before * 10 < total * 9; before += d._3; in
      }
      (ds.length.toLong, kept.length.toLong, kept.map(_._3).sum, total)
    }.toMap
    val got = CurationOps.qualityMass(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp)
    // the boundary-doc rule guarantees >= 90% of the mass is kept
    got.values.foreach { case (_, _, keptQ, totalQ) =>
      assert(keptQ * 10 >= totalQ * 9)
    }
  }
}
