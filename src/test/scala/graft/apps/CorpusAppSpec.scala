package graft.apps

import graft.TestSpark
import graft.apps.CorpusApp.CorpusDoc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** CorpusApp end-to-end: MemoryStream documents → streaming clean
  * (global exact dedup + quality gate) → dt-partitioned parquet, and
  * the stream must agree with the batch `clean` replay of the same
  * input — including a duplicate that arrives in a LATER micro-batch,
  * the case only global (unwatermarked) dedup state catches. */
class CorpusAppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2024-03-05 10:00:00")
  private val good1 = "the quick brown fox jumps over a lazy dog near the bank"
  private val good2 = "a completely different document about spark structured streaming state"
  private val shorty = "too few tokens"                       // < 5 tokens
  private val stoppy = "the the the the a a the a the a"      // stop ratio 100%
  private val good3 = "final unique document with enough ordinary words to pass the gate"

  test("streaming clean = batch clean; cross-batch duplicate is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CorpusDoc]
    val dir = java.nio.file.Files.createTempDirectory("corpus_app").toString
    val q = CorpusApp.run(mem.toDS(), s"$dir/out", s"$dir/ckpt")
    val b1 = Seq(
      CorpusDoc(1, good1, "en", "web", ts),
      CorpusDoc(2, good2, "en", "web", ts),
      CorpusDoc(3, good1, "en", "crawl", ts), // dup of 1, same batch
      CorpusDoc(4, shorty, "en", "web", ts),
      CorpusDoc(5, stoppy, "en", "web", ts))
    val b2 = Seq(
      CorpusDoc(6, good3, "en", "web", ts),
      CorpusDoc(7, good1, "en", "web", ts))   // dup of 1, LATER batch
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out")
      // content set identical to the batch transform over all input
      val batch = CorpusApp.clean((b1 ++ b2).toDF())
      assert(got.select("content_hash").collect().map(_.getString(0)).sorted.toSeq ==
        batch.select("content_hash").collect().map(_.getString(0)).sorted.toSeq)
      // the quality gate dropped the short and stop-heavy docs
      val texts = got.select("text").collect().map(_.getString(0)).toSet
      assert(texts == Set(good1, good2, good3))
      // the cross-batch duplicate (doc 7) was suppressed by global state
      assert(got.filter($"doc_id" === 7).isEmpty)
      assert(got.filter($"text" === good1).count() == 1)
      // accounting columns and partition column are real
      val r1 = got.filter($"doc_id" === 1).head()
      assert(r1.getAs[Long]("ws_tokens") == good1.split(" ").length)
      assert(r1.getAs[Long]("bpe_est_tokens") ==
        math.ceil(good1.replace(" ", "").length / 4.0).toLong)
      assert(r1.getAs[Int]("dt") == 20240305)
    } finally q.stop()
  }

  test("static blocklist gates the stream as a stream-static anti join") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CorpusDoc]
    val dir = java.nio.file.Files.createTempDirectory("corpus_app_bl").toString
    // ban good2 by content hash — the doc-level decontamination key
    val blocklist = Seq(good2).toDF("text")
      .select(org.apache.spark.sql.functions.md5($"text").as("content_hash"))
    val q = CorpusApp.run(mem.toDS(), s"$dir/out", s"$dir/ckpt",
      blocklist = Some(blocklist))
    try {
      mem.addData(
        CorpusDoc(1, good1, "en", "web", ts),
        CorpusDoc(2, good2, "en", "web", ts),
        CorpusDoc(3, good3, "en", "web", ts))
      q.processAllAvailable()
      val texts = spark.read.parquet(s"$dir/out")
        .select("text").collect().map(_.getString(0)).toSet
      assert(texts == Set(good1, good3), "blocklisted content must not land")
      // batch replay with the same blocklist agrees
      val batch = CorpusApp.clean(
        Seq(CorpusDoc(1, good1, "en", "web", ts),
          CorpusDoc(2, good2, "en", "web", ts),
          CorpusDoc(3, good3, "en", "web", ts)).toDF(),
        blocklist = Some(blocklist))
      assert(batch.select("text").collect().map(_.getString(0)).toSet ==
        Set(good1, good3))
    } finally q.stop()
  }

  test("observed metrics report admitted docs and token volume per batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CorpusDoc]
    val dir = java.nio.file.Files.createTempDirectory("corpus_app_obs").toString
    val q = CorpusApp.run(mem.toDS(), s"$dir/out", s"$dir/ckpt")
    try {
      mem.addData(
        CorpusDoc(1, good1, "en", "web", ts),
        CorpusDoc(2, good2, "en", "web", ts),
        CorpusDoc(3, shorty, "en", "web", ts)) // rejected by the gate
      q.processAllAvailable()
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("corpus_ingest")))
      assert(metrics.nonEmpty, "observe() metrics must surface in progress")
      // exactly the two admitted docs, with their real token volume
      assert(metrics.map(_.getAs[Long]("admitted_docs")).sum == 2)
      val wsExpected = good1.split(" ").length + good2.split(" ").length
      assert(metrics.map(_.getAs[Long]("admitted_ws_tokens")).sum == wsExpected)
    } finally q.stop()
  }

  test("restart from checkpoint keeps the dedup state (no re-admission)") {
    // a replayable FILE source (MemoryStream offsets don't survive a
    // restart): run 1 admits good1, run 2 restarts from the checkpoint
    // and must reject the same content arriving under a new doc_id
    val dir = java.nio.file.Files.createTempDirectory("corpus_app_rs").toString
    val in = s"$dir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def writeDocs(name: String, docs: Seq[CorpusDoc]): Unit = {
      val lines = docs.map { d =>
        s"""{"doc_id":${d.doc_id},"text":"${d.text}","lang":"${d.lang}",""" +
          s""""source":"${d.source}","ingest_ts":"2024-03-05 10:00:00"}"""
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/$name"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    def start() = {
      val docs = spark.readStream
        .schema("doc_id LONG, text STRING, lang STRING, source STRING, " +
          "ingest_ts TIMESTAMP")
        .json(in).as[CorpusDoc]
      CorpusApp.run(docs, s"$dir/out", s"$dir/ckpt")
    }
    writeDocs("b1.json", Seq(CorpusDoc(1, good1, "en", "web", ts)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    writeDocs("b2.json", Seq(
      CorpusDoc(99, good1, "en", "crawl", ts), // dup from run 1
      CorpusDoc(100, good2, "en", "web", ts)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$dir/out")
    assert(got.filter($"text" === good1).count() == 1)
    assert(got.filter($"doc_id" === 99).isEmpty)
    assert(got.filter($"doc_id" === 100).count() == 1)
  }

  test("per-source token budget gate spans micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CorpusDoc]
    val dir = java.nio.file.Files.createTempDirectory("corpus_app_bg").toString
    // budget 15 ws-tokens per source: web admits good1 (12 tokens) and
    // the NEXT doc that crosses the line (strictly-prior rule), then
    // rejects everything after — including across micro-batches
    val q = CorpusApp.run(mem.toDS(), s"$dir/out", s"$dir/ckpt",
      budgetTokens = Some(15L))
    val ts2 = java.sql.Timestamp.valueOf("2024-03-05 11:00:00")
    try {
      mem.addData(
        CorpusDoc(1, good1, "en", "web", ts),   // 12 tokens, spent_before=0
        CorpusDoc(2, good2, "en", "web", ts2),  // spent_before=12 < 15 → in
        CorpusDoc(3, good3, "en", "other", ts)) // other source, own budget
      q.processAllAvailable()
      mem.addData(
        CorpusDoc(6, good3, "en", "web", ts2))  // spent ≥ 15 → rejected
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out")
      val webDocs = got.filter($"source" === "web")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(webDocs == Set(1L, 2L),
        "web: first two admitted (strictly-prior rule), later batch rejected")
      assert(got.filter($"source" === "other").count() == 1,
        "budgets are per source")
      // batch twin over the same input agrees
      val batch = CorpusApp.budgetGate(CorpusApp.clean(Seq(
        CorpusDoc(1, good1, "en", "web", ts),
        CorpusDoc(2, good2, "en", "web", ts2),
        CorpusDoc(3, good3, "en", "other", ts),
        CorpusDoc(6, good3, "en", "web", ts2)).toDF()), 15L)
      assert(batch.select("doc_id").collect().map(_.getLong(0)).toSet ==
        got.select("doc_id").collect().map(_.getLong(0)).toSet)
    } finally q.stop()
  }

  test("bounded-heap admission ≡ naive sort-then-scan on shuffled orders") {
    // 60 docs, token counts 5..16, deterministic pseudo-random (ts, id)
    // order; the heap-based gate must admit EXACTLY the docs the naive
    // sorted prefix scan admits, at any arrival order / partitioning
    val docs = (0 until 60).map { i =>
      val toks = 5 + (i * 7) % 12
      // first token unique per doc: clean() dedups on content hash
      val words = (s"w$i" +: Seq.fill(toks - 1)("tok")).mkString(" ")
      val t = java.sql.Timestamp.valueOf(
        f"2024-03-05 10:${(i * 13) % 60}%02d:00")
      CorpusDoc((i * 29) % 61L, words, "en", "web", t)
    }
    val budget = 150L
    // naive reference: sort by (ts, id), admit while strictly-prior < budget
    val cleanedRef = CorpusApp.clean(docs.toDF()).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ingest_ts").getTime,
        r.getAs[Long]("doc_id"), r.getAs[Long]("ws_tokens")))
      .sortBy(t => (t._1, t._2))
    var spent = 0L
    val want = cleanedRef.flatMap { case (_, id, toks) =>
      if (spent < budget) { spent += toks; Some(id) } else None
    }.toSet
    for (parts <- Seq(1, 3, 8)) {
      val got = CorpusApp.budgetGate(
        CorpusApp.clean(docs.toDF()).repartition(parts), budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === want, s"parts=$parts")
    }
    // exhausted budget short-circuits to nothing
    assert(CorpusApp.budgetGate(CorpusApp.clean(docs.toDF()), 0L).isEmpty)
  }
}
