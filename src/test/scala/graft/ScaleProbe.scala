package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scale probe (test scope): runs selected queries against an
  * N-times-duplicated copy of the sf0.1 tables to observe scaling
  * behavior beyond the provided scale factors. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val qs = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q04_join_inner", "q13_window_tumble_10s",
        "q16_dedup_keep_first", "q23_word_count", "q29_minhash_signatures")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/scale_x$mult"
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    if (!new java.io.File(dst).exists()) {
      tables.foreach { t =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(s"$src/$t.parquet")
        val big = if (Seq("lineitem", "events", "documents", "embeddings",
            "part").contains(t))
          (1 to mult).map(_ => df).reduce(_ union _) else df
        big.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
    }
    // warmup
    spark.read.parquet(s"$dst/lineitem.parquet").count()
    qs.foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dst).count()
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $q (rows=$n)")
    }
    spark.stop()
  }
}
