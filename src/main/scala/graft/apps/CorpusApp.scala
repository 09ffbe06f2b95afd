package graft.apps

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}

/** A streaming document-ingest pipeline — the INCREMENTAL form of the
  * batch cleaning chain (exact dedup → quality gate → token
  * accounting): documents arrive continuously (in production from
  * `Sources.kafkaLines` + `from_json`; tests drive a MemoryStream
  * through the same code), each micro-batch is deduplicated against
  * ALL previously admitted content, filtered by the quality
  * heuristics, and appended to a date-partitioned corpus table with
  * per-doc token accounting columns.
  *
  * Dedup is `dropDuplicates` on the content hash with NO watermark —
  * a training corpus must never re-admit text it has already accepted,
  * so the hash set is global state, not a windowed one. State size is
  * one 16-byte md5 + key overhead per distinct document ever seen:
  * ~50 GB per billion docs, which is exactly what the RocksDB state
  * store (on in `GraftSession.production`) is for — the hash set
  * spills to executor-local disk and survives restarts through the
  * checkpoint. (A TTL'd `dropDuplicatesWithinWatermark` variant is the
  * right choice only when re-crawls are acceptable after a horizon.)
  *
  * Near-dup (MinHash) decisions need cross-document candidate joins
  * and stay in the batch chain (q110) over the corpus this app lands —
  * the standard lambda split: exact dedup inline, fuzzy dedup in the
  * periodic compaction pass.
  */
object CorpusApp {

  /** One incoming document. */
  case class CorpusDoc(doc_id: Long, text: String, lang: String,
      source: String, ingest_ts: java.sql.Timestamp)

  /** The cleaning transform shared by the stream and its batch replay
    * twin (CorpusAppSpec proves them equivalent): content-hash dedup →
    * optional blocklist gate → quality gate → accounting columns.
    *
    * `blocklist` is a STATIC frame of banned `content_hash` values
    * (benchmark/eval documents, takedowns) applied as a stream-static
    * LEFT ANTI equi-join — stateless on the stream side, broadcast by
    * the planner when small, and re-read each micro-batch so an updated
    * blocklist takes effect without a restart. This is the doc-level
    * half of decontamination; the n-gram overlap pass (q116/q119)
    * needs cross-document joins and runs in the batch compaction, the
    * same lambda split as near-dup below. */
  def clean(docs: DataFrame, minTokens: Int = 5,
      maxStopRatioPct: Int = 60,
      blocklist: Option[DataFrame] = None): DataFrame = {
    val toks = split(col("text"), " ")
    val stops = filter(toks, w => w.isin("the", "a"))
    val hashed = docs.withColumn("content_hash", md5(col("text")))
    blocklist.foldLeft(hashed)((df, bl) =>
        // before the dedup so banned docs never enter the hash-set state
        df.join(bl.select("content_hash"), Seq("content_hash"), "left_anti"))
      .dropDuplicates("content_hash")
      .withColumn("ws_tokens", size(toks).cast("long"))
      .withColumn("stop_tokens", size(stops).cast("long"))
      .filter(col("ws_tokens") >= minTokens &&
        col("stop_tokens") * 100 <= col("ws_tokens") * maxStopRatioPct)
      .withColumn("bpe_est_tokens",
        ceil(length(regexp_replace(col("text"), " ", "")).cast("double") / 4)
          .cast("long"))
  }

  /** One cleaned document (the `clean` output row). */
  case class CleanDoc(content_hash: String, doc_id: Long, text: String,
      lang: String, source: String, ingest_ts: java.sql.Timestamp,
      ws_tokens: Long, stop_tokens: Long, bpe_est_tokens: Long)

  /** Streaming per-source token-budget gate — the ONLINE twin of the
    * batch mixing step (q128): each source admits documents until its
    * whitespace-token budget is spent, then rejects forever. Same
    * admission rule as q128 (a doc enters iff the tokens admitted
    * STRICTLY BEFORE it are under budget, so overshoot is bounded by
    * one doc); the difference is the order — the batch mix picks a
    * reproducible salted-hash order over the whole corpus, the stream
    * must decide per arrival (ties inside a micro-batch broken by
    * (ingest_ts, doc_id) for replay determinism). State is one long
    * per source, permanent by design (a spent budget must stay spent
    * across restarts — it rides the checkpoint like the dedup hash
    * set), hence NoTimeout.
    *
    * Memory: the group function does NOT buffer the micro-batch. (A
    * pre-shuffle `sortWithinPartitions` cannot help here — the exchange
    * into the stateful operator interleaves map-side runs and re-sorts
    * on the grouping key only, so within-group secondary order never
    * survives to the group iterator; any deterministic admission must
    * re-establish (ts, id) order post-shuffle.) Instead of sorting the
    * whole group, a bounded candidate heap keeps only docs that can
    * still be admitted: the heap's max-(ts,id) doc is evicted as soon
    * as the tokens of the candidates ordered before it already cover
    * the remaining budget (its strictly-prior spend can only grow as
    * earlier docs arrive, so rejection is final), and any arrival
    * ordered at-or-after an evicted doc is rejected on sight. Held
    * tokens stay < remaining + one doc, i.e. O(remaining budget) docs
    * for ≥1-token docs (clean() guarantees ≥ minTokens), independent
    * of micro-batch size; once the budget is spent — the permanent
    * steady state — the iterator is discarded without buffering
    * anything. CorpusAppSpec proves equivalence with the naive
    * sort-then-scan admission on shuffled arrival orders. */
  /** The pure admission kernel of [[budgetGate]] — one unordered pass
    * over a group's docs with a bounded candidate heap. Extracted so
    * the heap logic is property-testable without Spark
    * (BudgetAdmitProperties checks it against naive sort-then-scan
    * over random streams). Returns (admitted docs in (ts, id) order,
    * final spent). */
  private[apps] def admitBounded(docs: Iterator[CleanDoc], spent0: Long,
      budgetTokens: Long): (List[CleanDoc], Long) = {
    val remaining = budgetTokens - spent0
    if (remaining <= 0L) return (Nil, spent0)
    val ord = Ordering.by[CleanDoc, (Long, Long)](d =>
      (d.ingest_ts.getTime, d.doc_id))
    val heap = scala.collection.mutable.PriorityQueue.empty[CleanDoc](ord)
    var heapTokens = 0L
    // min (ts, id) ever evicted: everything at-or-after it is
    // certainly rejected, so it never needs to enter the heap
    var cutTs = Long.MaxValue; var cutId = Long.MaxValue
    docs.foreach { d =>
      val key = (d.ingest_ts.getTime, d.doc_id)
      if (key._1 < cutTs || (key._1 == cutTs && key._2 < cutId)) {
        heap.enqueue(d); heapTokens += d.ws_tokens
        while (heap.length > 1 &&
            heapTokens - heap.head.ws_tokens >= remaining) {
          val ev = heap.dequeue()
          heapTokens -= ev.ws_tokens
          cutTs = ev.ingest_ts.getTime; cutId = ev.doc_id
        }
      }
    }
    var spent = spent0
    val out = heap.dequeueAll.reverseIterator.flatMap { (d: CleanDoc) =>
      if (spent < budgetTokens) { spent += d.ws_tokens; Some(d) }
      else None
    }.toList
    (out, spent)
  }

  def budgetGate(cleaned: DataFrame, budgetTokens: Long): DataFrame = {
    import cleaned.sparkSession.implicits._
    val streaming = cleaned.isStreaming
    cleaned.as[CleanDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, CleanDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, docs, state: GroupState[Long]) =>
          val spent0 = state.getOption.getOrElse(0L)
          val (out, spent) = admitBounded(docs, spent0, budgetTokens)
          if (streaming && spent != spent0) state.update(spent)
          out.iterator
      }.toDF()
  }

  def run(docs: Dataset[CorpusDoc], outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      blocklist: Option[DataFrame] = None,
      budgetTokens: Option[Long] = None): StreamingQuery =
    budgetTokens.foldLeft(clean(docs.toDF(), blocklist = blocklist))(
        (df, b) => budgetGate(df, b))
      // per-micro-batch data-quality telemetry, surfaced through
      // StreamingQueryProgress.observedMetrics — computed inline by the
      // running plan (no second pass over the batch), the monitoring
      // hook a production ingest alerts on (admission rate collapse,
      // token-volume anomalies)
      .observe("corpus_ingest",
        count(lit(1)).as("admitted_docs"),
        sum(col("ws_tokens")).as("admitted_ws_tokens"),
        sum(col("bpe_est_tokens")).as("admitted_bpe_tokens"))
      .withColumn("dt",
        date_format(col("ingest_ts"), "yyyyMMdd").cast("int"))
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("dt")
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()
}
