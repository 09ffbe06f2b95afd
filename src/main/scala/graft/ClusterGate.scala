package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}

/** Multi-JVM execution gate (VERDICT r10 task 1).
  *
  * Every run of this engine to date was single-JVM (`local[N]`), where
  * closures, broadcasts, typed `flatMapGroupsWithState` state machines
  * and the custom Catalyst expressions are shared BY REFERENCE between
  * "driver" and "executors" — serialization bugs are invisible. This
  * main re-runs a representative query subset under
  * `local-cluster[2,2,2048]` (Spark's standalone-in-miniature: master +
  * 2 workers in the driver JVM, each executor a SEPARATE spawned JVM),
  * which forces through the real boundaries:
  *
  *   - Java/Kryo closure serialization of every lambda and its capture
  *     (the typed groupByKey paths, the driver-side union-find collect);
  *   - broadcast-variable transport (the snowflake-dim multi-broadcast
  *     join q05, per-batch config broadcasts);
  *   - codegen + evaluation of the 7 custom Catalyst expressions on
  *     executors that loaded them from a classpath, not from the
  *     driver's heap (gram_hashes, vec_dot, winnow, edit-dist, exact
  *     distinct, top-k-by, tokenizer UDTF);
  *   - task-result serialization of every collected row;
  *   - localCheckpoint block storage on remote executors (the q110/q155
  *     bounded-frame materializations).
  *
  * Protocol: the subset runs TWICE in this JVM — once on `local[4]`
  * (same total cores / shuffle width as the cluster shape, so partition
  * layouts match), once on `local-cluster[2,2,2048]` — and each result
  * is fingerprinted (columns sorted by name, rows rendered and sorted,
  * MD5). The suite's decimal/integer aggregation discipline (NOTES:
  * results are partition-order-independent, which is what lets the
  * DuckDB gate hash-compare) makes the fingerprints comparable. A
  * mismatch or failure exits non-zero; the artifact (CLUSTERGATE.json)
  * carries per-query rows/hashes plus the executor JVM names
  * (pid@host, collected ON the executors) proving the run crossed real
  * process boundaries.
  *
  * Modes: `queries` (default) — the gate subset; `soak` — the
  * in-process streaming soak (Soak.runSoak: 6 concurrent checkpointed
  * queries, RocksDB state, restart, twin compare) under the cluster
  * master, i.e. state machines recovering on spawned-executor JVMs;
  * `all` — both.
  *
  * Requires SPARK_HOME (the spawned executor command is built from it)
  * and this package's compiled classes on a filesystem path (passed to
  * executors via spark.executor.extraClassPath — same machine, so a
  * local path is enough; a real cluster would ship a jar).
  */
object ClusterGate {

  /** ~30-query gate subset: every custom Catalyst expression, the
    * typed-state batch analogs, broadcast snowflake + salted joins, the
    * MinHash/CC dedup chain, one suffix query, both localCheckpoint
    * sites, ANN, multimodal, and the stream-era DWD queries. All from
    * the 355-exact set (deterministic under repartitioning by
    * construction — sketch/learner rows-only queries excluded). */
  val GateQueries: Seq[String] = Seq(
    "q01_pricing_summary",    // decimal agg baseline
    "q04_join_inner",         // shuffle join
    "q05_join_snowflake",     // 6-dim multi-BROADCAST join (J6)
    "q07_join_full_outer",    // full outer of aggregates (J10)
    "q10_distinct_counts",    // ExactDistinct typed Aggregator
    "q13_window_tumble_10s",  // tumbling window agg (A1/A3)
    "q14_daily_active_users", // daily-dedup UV (A5)
    "q16_dedup_keep_first",   // keep-first dedup (A7)
    "q17_dedup_keep_latest",  // keep-latest dedup (A8)
    "q18_returning_users",    // ≥8d returning (A6)
    "q19_sessionize_bounce",  // CEP bounce (§2.9)
    "q20_is_new_repair",      // is_new repair (P8)
    "q23_word_count",         // Tokenize UDTF (U1) — generator codegen
    "q29_minhash_signatures", // minhash sig gen
    "q30_minhash_lsh_buckets",// LSH banding
    "q31_ngram_jaccard",      // GramHashes custom expression
    "q33_cosine_topk",        // VecDot custom expression
    "q35_cosine_pairs",       // VecDot in a join
    "q39_ann_ivf",            // IVF ANN (k-means centroids collect)
    "q46_exact_distinct_agg", // ExactDistinct agg form
    "q47_salted_agg",         // skew salting
    "q55_topk_agg",           // TopKBy custom aggregate
    "q60_session_window",     // session windows
    "q65_fuzzy_name_match",   // EditDistBounded custom expression
    "q82_funnel_operator",    // CEP funnel
    "q83_dwd_cart_add",       // Maxwell envelope + delta (P2/P3)
    "q84_dwd_order_detail",   // 4-table join + lookup dims (J1/J3)
    "q94_binary_features",    // multimodal binary columns
    "q99_winnow_candidates",  // WinnowSketch custom expression
    "q109_scd2_asof",         // event-time as-of join
    "q110_minhash_dedup",     // full LSH→CC chain (driver union-find,
                              //   coalesced localCheckpoint)
    "q123_salted_join",       // salted join
    "q136_suffix_ranks",      // suffix-array family
    "q139_span_dedup_exact",  // span dedup over suffix runs
    "q146_bm25_topk",         // BM25 (eager localCheckpoint site)
    "q155_hybrid_rrf",        // RRF fusion (the r10 AQE-diamond fix)
    "q226_edit_dist_banded")  // banded edit distance at scale

  /** SPARK_GRAFT_PROFILE=production layers the 100 TB conf block over
    * BOTH passes (4096 shuffle partitions + AQE coalesce/skew +
    * RocksDB), composing the partition-count-invariance axis with the
    * JVM-boundary axis in one run. Both passes get identical confs, so
    * the fingerprint compare stays valid. */
  private val prodProfile =
    sys.env.get("SPARK_GRAFT_PROFILE").contains("production")

  /** Executors are sized to the PROFILE: the first production-profile
    * run at 2048 MB workers / 1536m executors lost BOTH executors to
    * OOM (exit 52) inside q110's 4096-wide label-propagation shuffles,
    * and the localCheckpoint blocks died with them —
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND, unrecoverable because a local
    * checkpoint truncates lineage. Two standing lessons recorded in
    * PLANS §round-11: production shuffle widths require
    * production-sized executors, and localCheckpoint trades
    * fault-tolerance for speed (an executor loss fails the JOB — on a
    * real cluster use reliable checkpoints where executor churn is
    * expected, or accept the re-run). */
  val ClusterMaster: String =
    if (prodProfile) "local-cluster[2,2,4096]" else "local-cluster[2,2,2048]"
  private val ExecutorMem = if (prodProfile) "3584m" else "1536m"

  private def buildSession(master: String): SparkSession = {
    val b0 = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(master)
      .appName(s"graft-clustergate-$master")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // production last, so its 4096 shuffle width overrides the 8
    val b = if (prodProfile) GraftSession.withProductionConfs(b0) else b0
    val withCluster = if (master.startsWith("local-cluster")) {
      // the spawned executor JVMs know nothing of sbt's classpath:
      // hand them this package's compiled classes explicitly (same
      // machine → a directory path works; a real cluster ships a jar)
      val classes = getClass.getProtectionDomain.getCodeSource
        .getLocation.getPath
      b.config("spark.executor.extraClassPath", classes)
        .config("spark.executor.memory", ExecutorMem)
    } else b
    val spark = withCluster.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Deterministic result fingerprint: columns sorted by name, every
    * row rendered to a canonical string, rows sorted, MD5 over the
    * sorted sequence. Mirrors the driver's DuckDB compare discipline
    * (sort columns, hash values) — valid for the exact-set queries,
    * whose outputs are partition-order-independent by construction. */
  private def fingerprint(df: DataFrame): (Long, String) = {
    def render(v: Any): String = v match {
      case null                => "\u0000"
      case b: Array[Byte]      => java.util.Base64.getEncoder.encodeToString(b)
      case s: Seq[_]           => s.map(render).mkString("[", ",", "]")
      case m: scala.collection.Map[_, _] =>
        m.toSeq.map { case (k, x) => render(k) + "=" + render(x) }
          .sorted.mkString("{", ",", "}")
      case r: org.apache.spark.sql.Row =>
        (0 until r.length).map(i => render(r.get(i))).mkString("(", ",", ")")
      case other => other.toString
    }
    val cols = df.columns.sorted
    val rows = df.select(cols.map(col): _*).collect()
    val lines = rows.map { r =>
      (0 until r.length).map(i => render(r.get(i))).mkString("\u0001")
    }.sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    // newline terminator per row so sorted lines can't alias across a
    // row boundary (("ab","c") vs ("a","bc") as consecutive rows)
    lines.foreach { l =>
      md.update(l.getBytes("UTF-8")); md.update('\n'.toByte)
    }
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  /** pid@host of every JVM that ran a task — the multi-process proof.
    * On local[4] this is one name (the driver's); on local-cluster it
    * must contain ≥2 names, none equal to the driver's. */
  private def executorJvms(spark: SparkSession): Seq[String] = {
    val n = spark.sparkContext.defaultParallelism * 4
    spark.sparkContext.parallelize(1 to n, n).map { _ =>
      java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    }.distinct().collect().toSeq.sorted
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  case class PassResult(jvms: Seq[String],
      results: Map[String, Either[String, (Long, String)]])

  private def runPass(master: String, names: Seq[String], sfDir: String)
      : PassResult = {
    val spark = buildSession(master)
    try {
      val jvms = executorJvms(spark)
      System.err.println(s"[clustergate] $master task JVMs: " +
        jvms.mkString(", "))
      val results = names.map { name =>
        val t0 = System.nanoTime()
        val r = try Right(fingerprint(SparkEntry.queries(name)(spark, sfDir)))
        catch { case e: Throwable =>
          System.err.println(s"[clustergate] $master $name FAILED: " +
            e.getMessage)
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
        System.err.println(f"[clustergate] $master $name " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
          r.fold(m => s"ERROR $m", { case (n, h) => s"rows=$n $h" }))
        name -> r
      }.toMap
      PassResult(jvms, results)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("queries")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    require(sys.env.contains("SPARK_HOME"),
      "SPARK_HOME must be set: local-cluster builds the executor launch " +
        "command from it (e.g. SPARK_HOME=/opt/spark)")
    val unknown = GateQueries.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown gate queries: $unknown")

    var exitCode = 0
    val out = new StringBuilder

    if (mode == "queries" || mode == "all") {
      val ref = runPass("local[4]", GateQueries, sfDir)
      val clu = runPass(ClusterMaster, GateQueries, sfDir)
      val multiJvm = clu.jvms.size >= 2
      if (!multiJvm) exitCode = 2
      val perQuery = GateQueries.map { name =>
        (ref.results(name), clu.results(name)) match {
          case (Right((nr, hr)), Right((nc, hc))) =>
            val ok = nr == nc && hr == hc
            if (!ok) exitCode = 1
            s"""${jstr(name)}:{"rows":$nc,"match":$ok}"""
          case (r, c) =>
            exitCode = 1
            val msg = Seq(r.left.toOption.map("local: " + _),
              c.left.toOption.map("cluster: " + _)).flatten.mkString("; ")
            s"""${jstr(name)}:{"error":${jstr(msg)}}"""
        }
      }
      val matched = GateQueries.count { n =>
        (ref.results(n), clu.results(n)) match {
          case (Right(a), Right(b)) => a == b
          case _ => false
        }
      }
      out ++= s""""gate":{"master":${jstr(ClusterMaster)},""" +
        s""""profile":"${if (prodProfile) "production" else "default"}",""" +
        s""""n":${GateQueries.size},"matched":$matched,""" +
        s""""multi_jvm":$multiJvm,""" +
        s""""driver_jvm":${jstr(java.lang.management.ManagementFactory
          .getRuntimeMXBean.getName)},""" +
        s""""executor_jvms":[${clu.jvms.map(jstr).mkString(",")}],""" +
        s""""queries":{${perQuery.mkString(",")}}}"""
      System.err.println(
        s"[clustergate] gate: $matched/${GateQueries.size} matched, " +
          s"multi_jvm=$multiJvm")
    }

    if (mode == "soak" || mode == "all") {
      if (out.nonEmpty) out ++= ","
      val spark = buildSession(ClusterMaster)
      // under the production profile, cap the STREAMING state width the
      // way the production soak does (soak.sh precedent): 4096-wide
      // state = ~17 stores/partition = ~70k RocksDB instances, which
      // OOMs small JVMs by structure; shuffle.partitions is a session
      // conf, so the runtime override applies to the streaming queries
      if (prodProfile) spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SOAK_PARTITIONS", "128"))
      try {
        val jvms = executorJvms(spark)
        val root = Files.createTempDirectory("graft_clustergate_soak")
          .toString
        val report = graft.apps.Soak.runSoak(spark, root)
        val ok = report.mismatches.isEmpty &&
          report.layers.forall(_._2 > 0) && jvms.size >= 2
        if (!ok) exitCode = 1
        out ++= s""""soak":{"master":${jstr(ClusterMaster)},""" +
          s""""profile":"${if (prodProfile) "production" else "default"}",""" +
          s""""multi_jvm":${jvms.size >= 2},""" +
          s""""executor_jvms":[${jvms.map(jstr).mkString(",")}],""" +
          s""""layers":{${report.layers.map { case (k, v) =>
            s"${jstr(k)}:$v" }.mkString(",")}},""" +
          s""""mismatches":[${report.mismatches.map(jstr).mkString(",")}],""" +
          s""""ok":$ok}"""
        System.err.println(s"[clustergate] soak: ok=$ok layers=" +
          report.layers.map { case (k, v) => s"$k=$v" }.mkString(","))
      } finally {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    val line = s"""{${out.toString},"exit":$exitCode}"""
    println(line)
    try Files.writeString(Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_CLUSTERGATE_OUT", "CLUSTERGATE.json")),
      line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[clustergate] artifact write failed: ${e.getMessage}")
    }
    if (exitCode != 0) sys.exit(exitCode)
  }
}
