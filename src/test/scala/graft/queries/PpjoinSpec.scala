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
