package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The reliable-checkpoint escape hatch (VERDICT r11 task 1, Mat.stable)
  * must be RESULT-INVISIBLE: `spark.graft.reliableCheckpoint=true` moves
  * the q110/q146/q155 bounded-frame materializations from executor
  * storage (localCheckpoint) to the checkpoint directory, and nothing
  * else — same rows, same plan shape above the materialization point.
  * The executor-loss behavioral difference (default dies loudly,
  * reliable survives) is pinned by ClusterGate's chaos mode, which
  * needs real executor JVMs; here we pin the correctness half on the
  * shared test session. */
class ReliableCheckpointSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val queries =
    Seq("q110_minhash_dedup", "q146_bm25_topk", "q155_hybrid_rrf")

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect().map(_.toString).sorted.toSeq
  }

  test("reliableCheckpoint=true returns identical rows for q110/q146/q155") {
    val base = queries.map(q => q -> rows(q)).toMap
    spark.conf.set(Mat.ConfKey, "true")
    try {
      queries.foreach { q =>
        val got = rows(q)
        assert(got == base(q), s"$q diverged under reliable checkpointing")
        assert(got.nonEmpty, s"$q returned no rows")
      }
      // the reliable path actually engaged: checkpoint FILES exist in
      // the dir Mat set (a dir-nonEmpty check alone could pass
      // spuriously on the shared session — code-review r12)
      val dir = spark.sparkContext.getCheckpointDir
      assert(dir.nonEmpty,
        "reliable path never set a checkpoint dir — conf not honored?")
      val files = java.nio.file.Files.walk(
          java.nio.file.Paths.get(new java.net.URI(dir.get).getPath))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"checkpoint dir ${dir.get} holds no partition " +
        "files — checkpoint() never wrote anything")
    } finally spark.conf.unset(Mat.ConfKey)
  }

  test("env fallback parses and conf wins over env") {
    // conf explicitly false beats any env setting
    spark.conf.set(Mat.ConfKey, "false")
    try {
      val df = graft.Tables.documents(spark, sf).limit(1)
      assert(!Mat.reliableEnabled(df))
    } finally spark.conf.unset(Mat.ConfKey)
  }
}
