package graft.queries

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q125/q126 semantics beyond the oracle rows: the quota plan matches an
  * independent window-function formulation, and the Bloom-prefiltered
  * blocklist matches the plain anti-join on a fixture that actually has
  * cross-source duplicate texts (the driver corpus has none, so the
  * ban-propagation branch would otherwise never be exercised). */
class QuotaBloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q125 topk_by plan ≡ row_number window formulation") {
    val got = CurationOps.sourceQuota(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val pri = conv(substring(
      md5(concat(col("doc_id").cast("string"), lit(":quota"))), 1, 13),
      16, 10).cast("long")
    val w = Window.partitionBy("source").orderBy(pri, col("doc_id"))
    val want = graft.Tables.documents(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .groupBy("source")
      .agg(count(lit(1)).as("kept_docs"), sum("n_chars").as("kept_chars"),
        countDistinct("lang").as("kept_langs"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got === want)
    assert(got.forall(_._2 == 20L), "cap should bind at 25 docs/source")
  }

  test("q126 bloom plan ≡ plain anti join on the corpus") {
    val got = CurationOps.bloomBlocklist(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("lang"), md5(col("text")).as("h"))
    val banned = docs.filter(col("source") === "src0").select("h").distinct()
    val want = docs.join(banned, Seq("h"), "left_anti")
      .groupBy("source", "lang").agg(count(lit(1)).as("kept_docs"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
    assert(!got.exists(_._1 == "src0"), "src0 must be fully banned")
  }

  test("q126 bans propagate to byte-identical copies in other sources") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_blk").toString
    val fixture = Seq(
      (0L, "banned text one", "en", "src0", 15L),
      (1L, "banned text two", "en", "src0", 15L),
      (2L, "banned text one", "en", "src1", 15L), // dup of a banned doc
      (3L, "clean text", "en", "src1", 10L),
      (4L, "banned text two", "de", "src2", 15L), // dup, other lang
      (5L, "clean text too", "de", "src2", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    fixture.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.bloomBlocklist(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("src1", "en", 1L), ("src2", "de", 1L)))
  }

  test("q126 bloom capacity is sized from the blocklist, not hardcoded") {
    import spark.implicits._
    // 3000 banned hashes (≠ the old 10000 default in either direction
    // that matters: small enough that a fixed big capacity would hide
    // sizing bugs, large enough that a fixed SMALL capacity would
    // saturate) + 20000 clean probes. The realized false-positive rate
    // on the clean probes must sit near the requested fpp — the
    // property the hardcoded capacity destroyed once the blocklist
    // outgrew it.
    val banned = (0 until 3000).map(i => s"banned:$i").toDF("h")
    val fpp = 0.01
    val bf = CurationOps.bannedBloom(banned, fpp)
    assert((0 until 3000).forall(i => bf.mightContainString(s"banned:$i")),
      "no false negatives")
    val fp = (0 until 20000).count(i => bf.mightContainString(s"clean:$i"))
    val rate = fp.toDouble / 20000
    // binomial σ ≈ sqrt(0.01*0.99/20000) ≈ 7e-4; allow a wide 3x band
    // (bloomFilter rounds bits/hashes, so realized fpp can sit below)
    assert(rate <= 3 * fpp, s"realized fpp $rate should be ≈ $fpp")
  }

  test("q126 probes through the native expression — no ScalaUDF in the plan") {
    // the r15 port (VERDICT r14 #4): the Bloom probe is a codegen'd
    // Catalyst expression, not a per-row Scala lambda. Pin both
    // directions: no ScalaUDF anywhere in the optimized plan, and the
    // native BloomMightContain present — so a convenience revert to
    // udf(...) fails the suite.
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val qe = CurationOps.bloomBlocklist(spark, sf).queryExecution
    val exprs = qe.optimizedPlan.flatMap(_.expressions)
    val udfs = exprs.flatMap(_.collect { case u: ScalaUDF => u })
    assert(udfs.isEmpty, s"ScalaUDF crept back into q126: $udfs")
    val native = exprs.flatMap(_.collect {
      case b: graft.functions.BloomMightContain => b })
    assert(native.nonEmpty, "native BloomMightContain missing from plan")
    // and the generated code must actually COMPILE: run once with
    // codegen fallback disabled so a doGenCode bug is a test failure,
    // not a silent interpreted fallback
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try CurationOps.bloomBlocklist(spark, sf).collect()
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("q126 null text is kept, not NPE'd") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_blk2").toString
    val fixture = Seq(
      (0L, "banned text", "en", "src0", 11L),
      (1L, null.asInstanceOf[String], "en", "src1", 0L),
      (2L, "clean", "en", "src1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    fixture.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.bloomBlocklist(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // the null-text doc is provably not on the blocklist → kept
    assert(got === Set(("src1", "en", 2L)))
  }
}
