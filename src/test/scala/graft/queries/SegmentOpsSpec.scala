package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Fixture contracts for the segment-granularity pack: q156 keep-first
  * line dedup, q157 PMI collocation ordering, q158 OOV accounting
  * (re-derived independently driver-side on the real corpus).
  */
class SegmentOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def seg(prefix: String): String =
    (0 until 12).map(i => s"$prefix$i").mkString(" ")

  test("q156 drops repeated segments globally, keeping the first owner") {
    import spark.implicits._
    val a = seg("a"); val b = seg("b"); val c = seg("c")
    val docs = Seq(
      (0L, s"$a $b"),     // both first occurrences
      (1L, s"$b $c"),     // b already owned by doc 0 → keeps only c
      (2L, s"$a $a"))     // both copies owned by doc 0 → keeps nothing
      .toDF("doc_id", "text")
    val out = SegmentOps.lineDedupFrom(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((2L, 2L, s"$a $b")))
    assert(out(1L) == ((2L, 1L, c)))
    assert(out(2L) == ((2L, 0L, "")))
  }

  test("q156 keeps the first copy of an intra-doc repeat") {
    import spark.implicits._
    val a = seg("a")
    val docs = Seq((7L, s"$a $a $a")).toDF("doc_id", "text")
    val out = SegmentOps.lineDedupFrom(docs).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 3L && out.head.getLong(2) == 1L)
    assert(out.head.getString(3) == a)
  }

  test("q157 ranks an always-adjacent rare pair above independent pairs") {
    import spark.implicits._
    // "x y" always adjacent (5 times, the c_xy floor); filler words are
    // frequent and mutually unordered, so their pairwise PMI is low
    val tokens =
      (0 until 5).flatMap(_ => Seq("x", "y")) ++
        (0 until 40).flatMap(i => Seq(s"f${i % 4}", s"f${(i + 1) % 4}"))
    val w = tokens.zipWithIndex
      .map { case (word, pos) => (0L, pos.toLong, word) }
      .toDF("doc_id", "pos", "word")
    val top = SegmentOps.pmiFrom(w).collect()
    assert(top.head.getString(1) == "x" && top.head.getString(0) == "y" ||
      top.head.getString(0) == "x" && top.head.getString(1) == "y")
    // exact fixed point: c_xy=5, c_x=c_y=5, N=90 → 5*90*1e6/25
    assert(top.head.getLong(3) == 5L * 90L * 1000000L / 25L)
  }

  test("q158 matches a driver-side OOV re-derivation on the real corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val counts = docs.flatMap(_._4.split(" ", -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = counts.toSeq.sortBy { case (wd, c) => (-c, wd) }
      .take(16).map(_._1).toSet
    val expected = docs
      .flatMap { case (_, lang, src, text) =>
        text.split(" ", -1).map(wd => ((lang, src), wd)) }
      .groupBy(_._1).view.mapValues { ws =>
        val total = ws.size.toLong
        val oov = ws.count(w => !vocab.contains(w._2)).toLong
        (total, oov, oov * 1000000L / total)
      }.toMap
    val got = SegmentOps.oovRate(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
  }
}
