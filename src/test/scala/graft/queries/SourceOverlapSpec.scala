package graft.queries

import graft.TestSpark
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** q141 invariants beyond the oracle rows: the Jaccard matrix is
  * re-derived independently driver-side (native hash included), and
  * controlled fixtures pin the two ends of the scale — a mirrored
  * source pair scores exactly 10⁶ ppm, a disjoint pair is absent.
  */
class SourceOverlapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def gramSet(text: String): Set[Long] = {
    val arr = graft.functions.GramHash.hashes(UTF8String.fromString(text), 8)
    (0 until arr.numElements()).map(arr.getLong).toSet
  }

  test("q141 matches an independent driver-side re-derivation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1).view
      .mapValues(_.iterator.flatMap(d => gramSet(d._2)).toSet).toMap
    val want = (for {
      a <- bySrc.keys; b <- bySrc.keys if a < b
      inter = (bySrc(a) & bySrc(b)).size.toLong if inter > 0
    } yield (a, b) -> (bySrc(a).size.toLong, bySrc(b).size.toLong, inter,
      inter * 1000000L / (bySrc(a).size + bySrc(b).size - inter))).toMap
    val got = CurationOps.sourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == want)
    assert(want.nonEmpty, "the corpus has overlapping sources")
  }

  test("q141 bounds: ordered pairs, inter <= min set, ppm in (0, 1e6]") {
    CurationOps.sourceOverlap(spark, sf).collect().foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(4) >= 1L && r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)))
      assert(r.getLong(5) >= 1L && r.getLong(5) <= 1000000L)
    }
  }

  test("q141 fixture: mirror pair at exactly 1e6 ppm, disjoint pair absent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ovl").toString
    val t1 = "a b c d e f g h i j k l m n o p"
    val t2 = "q r s t u v w x y z aa bb cc dd ee ff"
    Seq(
      (0L, t1, "en", "mirror1", 31L),
      (1L, t1, "en", "mirror2", 31L), // exact crawl mirror of mirror1
      (2L, t2, "en", "other", 46L))   // no gram shared with anyone
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = CurationOps.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(got == Map(("mirror1", "mirror2") -> 1000000L),
      "only the mirrored pair overlaps, and fully")
  }
}
