package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-ops utilities: small-file compaction (row-preserving, file
  * count derived from real on-disk bytes) and schema-evolution reads
  * (mergeSchema unifies snapshots by name; missing columns null-fill). */
class SinksOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("compact rewrites a many-small-files table preserving every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    val src = Tables.lineitem(spark, "/root/testdata/sf0.001")
    src.repartition(50).write.parquet(s"$dir/in") // 50 tiny files
    def files(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(s"$dir/in") == 50)
    // ~380 KB of parquet at sf0.001 → 1 MB target must yield ONE file
    val parts = graft.sinks.Sinks.compact(spark, s"$dir/in", s"$dir/out",
      targetBytes = 1L << 20)
    assert(parts == 1 && files(s"$dir/out") == 1)
    assert(spark.read.parquet(s"$dir/out").count() == src.count())
    // decimal sums survive the rewrite exactly (content, not just count)
    val s1 = src.agg(sum(col("l_quantity").cast("decimal(18,2)"))).head.getDecimal(0)
    val s2 = spark.read.parquet(s"$dir/out")
      .agg(sum(col("l_quantity").cast("decimal(18,2)"))).head.getDecimal(0)
    assert(s1 == s2)
  }

  test("compact fails fast on in-place rewrite and on an empty input") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp2").toString
    Tables.region(spark, "/root/testdata/sf0.001")
      .write.parquet(s"$dir/in")
    val inPlace = intercept[IllegalArgumentException] {
      graft.sinks.Sinks.compact(spark, s"$dir/in", s"$dir/in")
    }
    assert(inPlace.getMessage.contains("outDir must differ"))
    new java.io.File(s"$dir/empty").mkdirs()
    val empty = intercept[IllegalArgumentException] {
      graft.sinks.Sinks.compact(spark, s"$dir/empty", s"$dir/out")
    }
    assert(empty.getMessage.contains("no parquet files"))
  }

  test("readEvolved pins the type-conflict edge: widening is NOT merged") {
    // mergeSchema unifies by NAME (new/missing columns) but refuses
    // type changes — int→long across snapshots fails at schema merge,
    // not silently coerces. Pinned so an ingest that widens a column
    // knows it must rewrite old snapshots (or read with an explicit
    // schema), rather than discovering it from a deep stack trace.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_widen").toString
    Seq((1, 10)).toDF("id", "v").write.parquet(s"$dir/v1") // v: int
    Seq((2L, 20L)).toDF("id", "v").write.parquet(s"$dir/v2") // v: long
    val e = intercept[Throwable] {
      graft.sources.Sources.readEvolved(spark, Seq(s"$dir/v1", s"$dir/v2"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.toLowerCase.contains("merge") || m.toLowerCase.contains("incompatible")),
      s"expected a schema-merge failure, got: ${messages(e).mkString(" | ")}")
  }

  test("readEvolved unifies widened snapshots; plain read drops columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
    Seq((1L, "alpha")).toDF("doc_id", "text")
      .write.parquet(s"$dir/v1")
    Seq((2L, "beta", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/v2")
    val evolved = graft.sources.Sources.readEvolved(spark,
      Seq(s"$dir/v1", s"$dir/v2"))
    assert(evolved.columns.sorted.toSeq == Seq("doc_id", "quality", "text"))
    val rows = evolved.orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("quality")),
      "pre-evolution rows must null-fill the new column")
    assert(rows(1).getDouble(rows(1).fieldIndex("quality")) == 0.9)
    // the default single-footer read silently loses the new column —
    // the behavior readEvolved exists to prevent
    val naive = spark.read.parquet(s"$dir/v1", s"$dir/v2")
    assert(!naive.columns.contains("quality") || naive.columns.length == 3)
  }
}
