package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scale probe (test scope): runs selected queries against an
  * N-times-duplicated copy of the sf0.1 tables to observe scaling
  * behavior beyond the provided scale factors. */
object ScaleProbe {
  /** `skew` mode: the hot-bucket trap in isolation. Generates a corpus
    * where 50% of docs share a long boilerplate block (so their 5-min
    * winnowing sketches collide on the same window hashes — the
    * boilerplate-header scenario a real crawl guarantees) and compares
    * winnowCandidates / ngramJaccard with dfCap=∞ vs a finite cap.
    * Uncapped, the m docs sharing a hash form one m²∕2-pair bucket. */
  def skewProbe(spark: SparkSession, nDocs: Int): Unit = {
    val dst = s"/tmp/scale_skew_$nDocs"
    if (!new java.io.File(dst).exists()) {
      // ~500-char fixed boilerplate (even doc_ids) + ~270 chars of
      // deterministic per-doc unique tokens (md5-derived, no RNG).
      val boiler = (1 to 12).map(i => s"boilerplate header line $i of the corpus")
        .mkString(" ")
      spark.range(nDocs).selectExpr(
        "id AS doc_id",
        s"""concat(CASE WHEN id % 2 = 0 THEN '$boiler ' ELSE '' END,
           | concat_ws(' ', transform(sequence(1, 30),
           |   i -> substr(md5(concat(id, '-', i)), 1, 8)))) AS text""".stripMargin,
        "'en' AS lang")
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    }
    for ((label, cap) <- Seq(("dfCap=MAX", Int.MaxValue), ("dfCap=8", 8))) {
      val t0 = System.nanoTime()
      val pairs = graft.queries.TextOps.winnowCandidates(spark, dst, cap).count()
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  winnow $label " +
        f"(nDocs=$nDocs, candidate pairs=$pairs)")
    }
    for ((label, cap) <- Seq(("dfCap=MAX", Int.MaxValue), ("dfCap=8", 8))) {
      val t0 = System.nanoTime()
      val pairs = graft.queries.TextOps.ngramJaccard(spark, dst, cap).count()
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  ngramJaccard $label " +
        f"(docs<100 scope, pairs=$pairs)")
    }
    // The full chain (candidates → connected components → clusters) in
    // both configurations — proves the cap is threaded end to end, not
    // just through the candidate primitive.
    for ((label, cap) <- Seq(("dfCap=MAX", Int.MaxValue), ("dfCap=8", 8))) {
      val t0 = System.nanoTime()
      val rows = graft.queries.Advanced.dedupClusters(spark, dst, cap).count()
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  dedupClusters $label " +
        f"(docs<100 scope, clustered docs=$rows)")
    }
  }

  /** `suffix` mode: q136/q137 cost vs the doc cap (their scale knob —
    * the ×N replicated-table probe does not apply because it duplicates
    * (doc_id, pos) keys, which a suffix array treats as one corpus with
    * a broken primary key; growing the cap grows the REAL corpus under
    * the sort linearly). */
  def suffixProbe(spark: SparkSession, caps: Seq[Int]): Unit = {
    val src = "/root/testdata/sf0.1"
    caps.foreach { cap =>
      var t0 = System.nanoTime()
      val n = graft.queries.SuffixOps.suffixRanksAt(spark, src, cap).count()
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  suffixRanks cap=$cap (positions=$n)")
      t0 = System.nanoTime()
      val m = graft.queries.SuffixOps.longestRepeatAt(spark, src, cap).count()
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  longestRepeat cap=$cap (docs=$m)")
      t0 = System.nanoTime()
      val c = graft.queries.SuffixOps.contaminationSpanAt(spark, src, cap).count()
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  contamination cap=$cap (docs=$c)")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("suffix")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      suffixProbe(spark, if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
        else Seq(100, 300, 1000))
      spark.stop(); return
    }
    if (args.headOption.contains("skew")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      args.drop(1).headOption.map(_.toInt).map(Seq(_))
        .getOrElse(Seq(1000, 5000, 10000)).foreach(skewProbe(spark, _))
      spark.stop(); return
    }
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
