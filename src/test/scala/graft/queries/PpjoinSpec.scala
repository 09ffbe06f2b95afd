package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q182 contracts: on a corpus with KNOWN near-dup families the
  * prefix-filtered join returns exactly the brute-force threshold
  * join (losslessness with positive rows — the sf0.01 oracle row is
  * vacuously 0), with exact inter/union values.
  */
class PpjoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def grams3(text: String): Set[String] =
    text.split(" ", -1).sliding(3).map(_.mkString(" ")).toSet

  test("q184 precision/recall re-derive from first principles") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter(_._1 % 4 == 0).toMap
    val sets = docs.view.mapValues(_.split(" ", -1).toSet).toMap
    val truth = (for {
      a <- sets.keys.toSeq; b <- sets.keys.toSeq if a < b
      inter = (sets(a) & sets(b)).size
      union = (sets(a) | sets(b)).size
      if inter * 100 >= 90 * union
    } yield (a, b)).toSet
    // independent re-statement of the salted polynomial minhash
    def poly(s: String): Long = s.foldLeft(0L)((h, c) =>
      (h * graft.functions.GramHash.Base + (c.toInt % 256)) %
        graft.functions.GramHash.P)
    def sig(text: String): IndexedSeq[Long] = {
      val ws = text.split(" ", -1).distinct
      (1 to 4).map(k => ws.map(w => poly(s"s$k: $w")).min)
    }
    // one bucket space across bands — the q30/q142 house convention
    val bands = docs.toSeq.flatMap { case (id, t) =>
      val g = sig(t)
      Seq(((g(0), g(1)), id), ((g(2), g(3)), id))
    }
    val pred = bands.groupBy(_._1).values.flatMap { rows =>
      val ids = rows.map(_._2).distinct.sorted
      for (i <- ids.indices; j <- i + 1 until ids.size)
        yield (ids(i), ids(j))
    }.toSet
    val hit = (pred & truth).size.toLong
    val r = TextOps.lshEval(spark, sf).collect().head
    assert(r.getLong(0) == truth.size.toLong)
    assert(r.getLong(1) == pred.size.toLong)
    assert(r.getLong(2) == hit)
    assert(r.getLong(3) == hit * 1000000L / pred.size)
    assert(r.getLong(4) == hit * 1000000L / truth.size)
    assert(hit > 0)
  }

  test("prefix filtering loses nothing on a dup-family fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ppjoin").toString
    val boiler = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, s"$boiler extra0 end0"),           // family A
      (1L, s"$boiler extra1 end1"),           // family A (≥50% vs 0)
      (2L, s"$boiler extra2 end2"),           // family A
      (3L, (31 to 60).map(i => s"alt$i").mkString(" ")),  // singleton
      (4L, (31 to 60).map(i => s"alt$i").mkString(" ") + " tail4"), // family B with 3
      (5L, (100 to 140).map(i => s"uniq$i").mkString(" ")) // singleton
    ).map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val sets = docs.collect()
      .map(r => r.getLong(0) -> grams3(r.getString(1))).toMap
    val expected = (for {
      a <- sets.keys.toSeq; b <- sets.keys.toSeq if a < b
      inter = (sets(a) & sets(b)).size.toLong
      union = (sets(a) | sets(b)).size.toLong
      if inter > 0 && inter * 100 >= union * 50
    } yield (a, b) -> ((inter, union))).toMap

    val got = TextOps.ppjoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(expected.size >= 4, s"fixture has dup families: $expected")
  }
}
