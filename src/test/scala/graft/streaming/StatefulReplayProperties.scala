package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalacheck.{Gen, Prop, Properties, Test => ScTest}

/** Property-fuzz of the stateful streaming machines (VERDICT r12 task 2):
  * random event multisets with duplications, random micro-batch
  * boundaries, and — for the operators whose contract covers it —
  * random event-time disorder bounded by the watermark delay, asserting
  * STREAMING REPLAY ≡ BATCH TWIN on every trial.
  *
  * Delivery-order contracts honored per operator (each documented at the
  * operator): `dailyFirst`/`repairIsNew`/`classifyLogins`/`keepFirst`/
  * `funnel` assume per-key in-order delivery (the reference gets this
  * from Kafka partitioning by key), so their trials randomize batch
  * BOUNDARIES and duplication over a ts-ordered stream; `keepLatest`
  * (max is order-insensitive) is fuzzed under FULL permutation; and
  * `detectBounces` (the watermark-buffered CEP machine) is fuzzed under
  * random disorder strictly bounded by the watermark delay — the
  * strongest claim, matching its Flink-CEP-buffering semantics.
  * `EarlyFire` has no batch twin by design (the firing RULE is the
  * operator); its trials pin the firing-rule invariants against an
  * independent window count.
  *
  * Trials run real micro-batches (MemoryStream → memory sink), so the
  * per-property trial count is tuned down — breadth comes from the
  * generators, not the count. `GRAFT_FUZZ_N` overrides the per-property
  * trial count (default 8; the round ladder runs a deep pass at ≥50 —
  * VERDICT r13 task 3). */
object StatefulReplayProperties extends Properties("graft.statefulReplay") {

  private val FuzzN = sys.env.getOrElse("GRAFT_FUZZ_N", "8").toInt

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(FuzzN).withWorkers(1)

  private lazy val spark = TestSpark.spark
  private val qid = new java.util.concurrent.atomic.AtomicInteger
  private val Day = 24L * 3600 * 1000

  /** Drive `build` over the batches as a real streaming query (memory
    * sink, Append), returning everything emitted. */
  private def runStream[I: Encoder, O: Encoder](batches: Seq[Seq[I]],
      build: Dataset[I] => Dataset[O]): Seq[O] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[I]
    val name = s"fuzz_out_${qid.incrementAndGet()}"
    val q = build(mem.toDS()).writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) mem.addData(b: _*)
        q.processAllAvailable()
      }
      spark.table(name).as[O].collect().toSeq
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  // ---- generators ----

  private val genKey = Gen.oneOf("k0", "k1", "k2", "k3", "k4")

  /** Cut a sequence into 1..n micro-batches at random boundaries. */
  private def genBatches[T](events: Seq[T]): Gen[Seq[Seq[T]]] =
    Gen.listOfN(events.size, Gen.frequency((1, true), (2, false))).map {
      cuts =>
        val out = Seq.newBuilder[Seq[T]]
        var cur = Seq.newBuilder[T]
        events.zip(cuts).foreach { case (e, cut) =>
          if (cut) { out += cur.result(); cur = Seq.newBuilder[T] }
          cur += e
        }
        out += cur.result()
        out.result()
    }

  /** Base events with distinct (key, ts), plus EXACT duplicates of a
    * random subset (retraction-replay shape: identical rows re-arrive). */
  /** `tsMin` stays strictly ABOVE epoch 0: Spark's initial watermark is
    * 0, and the late-record filter drops rows with eventTime <= wm, so a
    * ts-0 event is silently late from the very first batch — a real
    * streaming-semantics edge this fuzz found on its first run. */
  private def genKeyedEvents(tsMin: Long, tsMax: Long, nMax: Int)
      : Gen[Seq[KeyedEvent]] = for {
    n <- Gen.chooseNum(1, nMax)
    base0 <- Gen.listOfN(n, for {
      k <- genKey
      t <- Gen.chooseNum(tsMin, tsMax)
      p <- Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
    } yield KeyedEvent(k, t, p))
    base = base0.groupBy(e => (e.key, e.ts)).values.map(_.head).toSeq
    dups <- Gen.someOf(base)
  } yield base ++ dups

  private def sortedBatches(evs: Seq[KeyedEvent])
      : Gen[Seq[Seq[KeyedEvent]]] =
    genBatches(evs.sortBy(e => (e.ts, e.payload, e.key)))

  // ---- Dedup.dailyFirst (A5) ----

  property("dailyFirst: replay ≡ batch for any events × dups × batching") =
    Prop.forAllNoShrink(genKeyedEvents(Day, 4 * Day - 1, 24).flatMap(evs =>
      sortedBatches(evs).map(bs => (evs, bs)))) { case (evs, batches) =>
      import spark.implicits._
      val streamed = runStream[KeyedEvent, DailyFirst](batches,
        // delay 5 s: with ts-sorted arrival, wm = maxSeen - 5000 < every
        // arriving ts, so equal-ts rows split across batches are never
        // late-dropped (eventTime <= wm drops); state-eviction analysis
        // is unchanged (wm only lower)
        ds => Dedup.dailyFirst(Dedup.withMsWatermark(ds, delay = "5 seconds")))
      val batch = Dedup.dailyFirst(evs.toDS()).collect().toSeq
      def norm(rows: Seq[DailyFirst]) =
        rows.map(r => (r.key, r.date, r.ts)).sorted
      norm(streamed) == norm(batch)
    }

  // ---- Dedup.keepLatest (A8) — FULL permutation: max is commutative ----

  property("keepLatest: replay ≡ batch under ANY permutation × batching") =
    Prop.forAllNoShrink(for {
      evs <- genKeyedEvents(3600000L, 3700000L, 20)
      shuffled <- Gen.const(evs).flatMap(e =>
        Gen.listOfN(e.size, Gen.chooseNum(0, 1 << 20)).map(ks =>
          e.zip(ks).sortBy(_._2).map(_._1)))
      bs <- genBatches(shuffled)
    } yield (evs, bs)) { case (evs, batches) =>
      import spark.implicits._
      // watermark delay >> ts range: nothing quiesces mid-run, every key
      // flushes exactly once at the far-future ticks (batch twin emits
      // exactly once per key) — duplicates and disorder are both legal
      val flush = Seq(
        Seq(KeyedEvent("zztick", 2000000000L, "t1")),
        Seq(KeyedEvent("zztick", 2000001000L, "t2")))
      val streamed = runStream[KeyedEvent, KeyedEvent](batches ++ flush,
        ds => Dedup.keepLatest(
          Dedup.withMsWatermark(ds, delay = "1000 seconds")))
        .filter(_.key != "zztick")
      val batch = Dedup.keepLatest(evs.toDS()).collect().toSeq
      def norm(rows: Seq[KeyedEvent]) =
        rows.map(r => (r.key, r.ts, r.payload)).sorted
      norm(streamed) == norm(batch)
    }

  // ---- Dedup.keepFirst (A7) ----

  property("keepFirst: replay ≡ batch for in-order events × dups × batching") =
    Prop.forAllNoShrink(genKeyedEvents(3600000L, 3700000L, 24).flatMap(evs =>
      sortedBatches(evs).map(bs => (evs, bs)))) { case (evs, batches) =>
      import spark.implicits._
      // delay >> ts range: no marker eviction mid-run, so first ARRIVAL
      // (streaming) = min-ts row (batch) under in-order delivery
      def withEt(ds: Dataset[KeyedEvent]) = ds.toDF()
        .withColumn("event_time", (col("ts") / 1000).cast("timestamp"))
      val streamed = runStream[KeyedEvent, KeyedEvent](batches,
        ds => {
          import ds.sparkSession.implicits._
          Dedup.keepFirst(withEt(ds), Seq("key"), "event_time",
            "1000 seconds").select("key", "ts", "payload").as[KeyedEvent]
        })
      val batch = Dedup.keepFirst(withEt(evs.toDS()), Seq("key"),
        "event_time").select("key", "ts", "payload").as[KeyedEvent]
        .collect().toSeq
      def norm(rows: Seq[KeyedEvent]) =
        rows.map(r => (r.key, r.ts, r.payload)).sorted
      norm(streamed) == norm(batch)
    }

  // ---- VisitorState.repairIsNew (P8) ----

  private def genPageEvents(tsMax: Long, nMax: Int): Gen[Seq[PageEvent]] =
    for {
      n <- Gen.chooseNum(1, nMax)
      base0 <- Gen.listOfN(n, for {
        k <- genKey
        t <- Gen.chooseNum(Day, tsMax)
        nw <- Gen.oneOf("0", "1")
        last <- Gen.oneOf(None, Some("home"))
      } yield PageEvent(k, "home", last, nw, t))
      base = base0.groupBy(e => (e.mid, e.ts)).values.map(_.head).toSeq
      dups <- Gen.someOf(base)
    } yield base ++ dups

  property("repairIsNew: replay ≡ batch for in-order events × dups × batching") =
    Prop.forAllNoShrink(genPageEvents(4 * Day - 1, 24).flatMap { evs =>
      genBatches(evs.sortBy(e => (e.ts, e.mid, e.isNew))).map(bs => (evs, bs))
    }) { case (evs, batches) =>
      import spark.implicits._
      val streamed = runStream[PageEvent, PageEvent](batches,
        VisitorState.repairIsNew)
      val batch = VisitorState.repairIsNew(evs.toDS()).collect().toSeq
      def norm(rows: Seq[PageEvent]) =
        rows.map(r => (r.mid, r.ts, r.isNew, r.pageId,
          r.lastPageId.getOrElse(""))).sorted
      norm(streamed) == norm(batch)
    }

  // ---- VisitorState.classifyLogins (A6) ----

  property("classifyLogins: replay ≡ batch for in-order events × dups × batching") =
    Prop.forAllNoShrink(genKeyedEvents(Day, 21 * Day - 1, 24).flatMap(evs =>
      sortedBatches(evs).map(bs => (evs, bs)))) { case (evs, batches) =>
      import spark.implicits._
      val streamed = runStream[KeyedEvent, LoginActivity](batches,
        ds => VisitorState.classifyLogins(ds))
      val batch = VisitorState.classifyLogins(evs.toDS()).collect().toSeq
      def norm(rows: Seq[LoginActivity]) =
        rows.map(r => (r.uid, r.date, r.ts, r.uu, r.back)).sorted
      norm(streamed) == norm(batch)
    }

  // ---- Sessionize.detectBounces — random DISORDER within the delay ----

  property("detectBounces: replay ≡ batch under bounded disorder × batching") =
    Prop.forAllNoShrink(for {
      n <- Gen.chooseNum(1, 24)
      delayS <- Gen.oneOf(15L, 40L)
      evs0 <- Gen.listOfN(n, for {
        k <- genKey
        t <- Gen.chooseNum(3600000L, 3690000L)
        entry <- Gen.oneOf(true, false)
        // arrival jitter strictly below the watermark delay: every event
        // arrives while wm < its ts, so nothing is late-dropped and the
        // buffered machine must reconstruct event order exactly
        j <- Gen.chooseNum(0L, delayS * 1000 - 5001)
      } yield (PageEvent(k, "home", if (entry) None else Some("home"),
        "0", t), t + j))
      bs <- genBatches(evs0.sortBy { case (e, a) =>
        (a, e.ts, e.lastPageId.isEmpty) }.map(_._1))
    } yield (evs0.map(_._1), bs, delayS)) { case (evs, batches, delayS) =>
      import spark.implicits._
      val flush = Seq(
        Seq(PageEvent("zztick", "home", Some("home"), "0", 10000000L)),
        Seq(PageEvent("zztick", "home", Some("home"), "0", 10001000L)))
      val streamed = runStream[PageEvent, Bounce](batches ++ flush,
        ds => Sessionize.detectBounces(ds
          .withColumn("eventTime", (col("ts") / 1000).cast("timestamp"))
          .withWatermark("eventTime", s"$delayS seconds")
          .as[PageEvent]))
        .filter(_.mid != "zztick")
      val batch = Sessionize.detectBounces(evs.toDS()).collect().toSeq
      def norm(rows: Seq[Bounce]) = rows.map(r => (r.mid, r.ts)).sorted
      norm(streamed) == norm(batch)
    }

  // ---- Sessionize.funnel — random steps, gaps, dups, batching ----

  property("funnel(3): replay ≡ batch for in-order events × dups × batching") =
    Prop.forAllNoShrink(for {
      n <- Gen.chooseNum(1, 24)
      t1 <- Gen.chooseNum(1000L, 30000L)
      t2 <- Gen.chooseNum(1000L, 30000L)
      base0 <- Gen.listOfN(n, for {
        k <- genKey
        t <- Gen.chooseNum(3600000L, 3720000L)
        s <- Gen.chooseNum(0, 2)
      } yield FunnelEvent(k, t, s))
      base = base0.groupBy(e => (e.key, e.ts, e.step)).values.map(_.head).toSeq
      dups <- Gen.someOf(base)
      evs = base ++ dups
      bs <- genBatches(evs.sortBy(e => (e.ts, e.step, e.key)))
    } yield (evs, bs, Seq(t1, t2))) { case (evs, batches, gaps) =>
      import spark.implicits._
      val flush = Seq(
        Seq(FunnelEvent("zztick", 900000000L, 0)),
        Seq(FunnelEvent("zztick", 900001000L, 1)))
      val streamed = runStream[FunnelEvent, FunnelOutcome](batches ++ flush,
        ds => Sessionize.funnel(
          Dedup.withMsWatermark(ds, delay = "5 seconds"), 3, gaps,
          tombstoneMs = 10000L * Day))
        .filter(_.key != "zztick")
      val batch = Sessionize.funnel(evs.toDS(), 3, gaps).collect().toSeq
      def norm(rows: Seq[FunnelOutcome]) = rows.map(r =>
        (r.key, r.anchorTs, r.completed, r.lastStepTs, r.stepsReached)).sorted
      norm(streamed) == norm(batch)
    }

  // ---- disorder BEYOND the watermark: the documented DROP semantics ----
  // (VERDICT r13 task 3: the drop-beyond-watermark contract as a property,
  // not a fixture rule.) Spark's late filter drops eventTime <= wm, where
  // wm lags maxSeen by the delay and updates at batch END — so an event
  // at ts <= (clockTs − delay) arriving AFTER the clock batch must never
  // surface NOR perturb state: replay over (clock ∪ late ∪ live) must
  // equal the batch twin over LIVE ONLY.

  property("dailyFirst: events at/before the watermark are dropped, " +
    "never emitted, never perturb state") =
    Prop.forAllNoShrink(for {
      clockTs <- Gen.chooseNum(10 * Day, 10 * Day + 3600000L)
      nLate <- Gen.chooseNum(1, 10)
      nLive <- Gen.chooseNum(0, 10)
      late <- Gen.listOfN(nLate, for {
        k <- genKey
        t <- Gen.chooseNum(Day, clockTs - 5000) // event_time <= wm
      } yield KeyedEvent(k, t, "late"))
      live <- Gen.listOfN(nLive, for {
        k <- genKey
        t <- Gen.chooseNum(clockTs - 4999, clockTs + 4000) // > wm
      } yield KeyedEvent(k, t, "live"))
    } yield (clockTs, late, live)) { case (clockTs, late, live) =>
      import spark.implicits._
      val clock = KeyedEvent("zzclk", clockTs, "clk")
      val batches = Seq(Seq(clock), (late ++ live).sortBy(_.ts))
      val streamed = runStream[KeyedEvent, DailyFirst](batches,
        ds => Dedup.dailyFirst(Dedup.withMsWatermark(ds, delay = "5 seconds")))
        .filter(_.key != "zzclk")
      val batchTwin = Dedup.dailyFirst(live.toDS()).collect().toSeq
      def norm(rows: Seq[DailyFirst]) =
        rows.map(r => (r.key, r.date, r.ts)).sorted
      val liveTs = live.map(_.ts).toSet
      norm(streamed) == norm(batchTwin) &&
        streamed.forall(r => liveTs.contains(r.ts)) // no late ts leaks out
    }

  // ---- the epoch-0 edge as a property (found by this suite in r13):
  // Spark's INITIAL watermark is epoch 0 and the late filter drops
  // eventTime <= wm, so a ts=0 event is silently late from the very
  // first batch while any ts > 0 event is kept ----

  property("dailyFirst: ts=0 events are late from the FIRST batch; " +
    "ts>0 events are not") =
    Prop.forAllNoShrink(for {
      n0 <- Gen.chooseNum(1, 6)
      n1 <- Gen.chooseNum(1, 12)
      zeros <- Gen.listOfN(n0, genKey.map(KeyedEvent(_, 0L, "z")))
      livePos <- Gen.listOfN(n1, for {
        k <- genKey
        t <- Gen.chooseNum(1L, 4000L)
      } yield KeyedEvent(k, t, "p"))
    } yield (zeros, livePos)) { case (zeros, livePos) =>
      import spark.implicits._
      val batches = Seq((zeros ++ livePos).sortBy(e => (e.ts, e.key)))
      val streamed = runStream[KeyedEvent, DailyFirst](batches,
        ds => Dedup.dailyFirst(Dedup.withMsWatermark(ds, delay = "5 seconds")))
      val batchTwin = Dedup.dailyFirst(livePos.toDS()).collect().toSeq
      def norm(rows: Seq[DailyFirst]) =
        rows.map(r => (r.key, r.date, r.ts)).sorted
      norm(streamed) == norm(batchTwin) && streamed.forall(_.ts > 0L)
    }

  // ---- equal-ts TIES split across batch boundaries (VERDICT r13 task 3):
  // ts drawn from a tiny pool so same-(key,ts) rows with DIFFERENT
  // payloads collide, across two adjacent days; the ts-sorted batching
  // can split a tie group anywhere ----

  property("dailyFirst: replay ≡ batch under equal-ts ties split across batches") =
    Prop.forAllNoShrink(for {
      pool1 <- Gen.listOfN(3, Gen.chooseNum(Day, Day + 4000))
      pool2 <- Gen.listOfN(3, Gen.chooseNum(2 * Day, 2 * Day + 4000))
      n <- Gen.chooseNum(2, 24)
      evs <- Gen.listOfN(n, for {
        k <- genKey
        t <- Gen.oneOf(pool1 ++ pool2)
        p <- Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString)
      } yield KeyedEvent(k, t, p))
      bs <- genBatches(evs.sortBy(e => (e.ts, e.payload, e.key)))
    } yield (evs, bs)) { case (evs, batches) =>
      import spark.implicits._
      // delay 5 s ≥ the 4 s within-day spread: an equal-ts row in a later
      // batch always satisfies ts > maxSeen − 5000, so ties are never
      // late-dropped and the tie-handling path itself is what's tested
      val streamed = runStream[KeyedEvent, DailyFirst](batches,
        ds => Dedup.dailyFirst(Dedup.withMsWatermark(ds, delay = "5 seconds")))
      val batchTwin = Dedup.dailyFirst(evs.toDS()).collect().toSeq
      def norm(rows: Seq[DailyFirst]) =
        rows.map(r => (r.key, r.date, r.ts)).sorted
      norm(streamed) == norm(batchTwin)
    }

  // ---- cross-operator COMPOSITION (VERDICT r13 task 3): two keyed-state
  // machines chained inside ONE streaming query (Spark 4 supports
  // multiple stateful operators) — is_new repair feeding the daily-first
  // dedup, against the same chain composed in batch mode. Catches state
  // interactions (e.g. the repair re-ordering rows within a batch in a
  // way the downstream machine's in-order contract wouldn't survive). ----

  property("repairIsNew ∘ dailyFirst: chained replay ≡ chained batch twin") =
    Prop.forAllNoShrink(genPageEvents(4 * Day - 1, 24).flatMap { evs =>
      genBatches(evs.sortBy(e => (e.ts, e.mid, e.isNew))).map(bs => (evs, bs))
    }) { case (evs, batches) =>
      import spark.implicits._
      def chain(ds: Dataset[PageEvent]): Dataset[DailyFirst] =
        Dedup.dailyFirst(Dedup.withMsWatermark(
          VisitorState.repairIsNew(ds)
            .map(p => KeyedEvent(p.mid, p.ts, p.isNew)),
          delay = "5 seconds"))
      val streamed = runStream[PageEvent, DailyFirst](batches, chain)
      val batchTwin = chain(evs.toDS()).collect().toSeq
      def norm(rows: Seq[DailyFirst]) =
        rows.map(r => (r.key, r.date, r.ts)).sorted
      norm(streamed) == norm(batchTwin)
    }

  // ---- EarlyFire — firing-rule invariants vs an independent count ----

  property("earlyFire: per-window fires are increasing, ≤1 closed (last), " +
    "and the last fire carries the exact window count") =
    Prop.forAllNoShrink(genKeyedEvents(3600000L, 3660000L, 20).flatMap(evs =>
      sortedBatches(evs).map(bs => (evs, bs)))) { case (evs, batches) =>
      val confKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(confKey)
      spark.conf.set(confKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        import spark.implicits._
        val windowMs = 10000L
        val flush = Seq(
          Seq(KeyedEvent("zztick", 50000000L, "t1")),
          Seq(KeyedEvent("zztick", 50001000L, "t2")))
        val fires = runStream[KeyedEvent, WindowCount](batches ++ flush,
          ds => EarlyFire.windowCounts(
            Dedup.withMsWatermark(ds, delay = "5 seconds"),
            windowMs = windowMs, graceMs = 5000L))
          .filter(_.key != "zztick")
        val want = evs.groupBy(e =>
          (e.key, e.ts - java.lang.Math.floorMod(e.ts, windowMs)))
          .view.mapValues(_.size.toLong).toMap
        val byWindow = fires.groupBy(f => (f.key, f.windowStart))
        // every window with events fires at least once, none without;
        // memory-sink row ORDER is not a contract, so the "closed is the
        // last fire" pin is stated value-wise: fires carry strictly
        // increasing cumulative counts, so the closed fire (if any) and
        // the final fire both carry the max — which must be the exact
        // window count
        byWindow.keySet == want.keySet && byWindow.forall {
          case (w, fs) =>
            val cnts = fs.map(_.cnt)
            val closed = fs.filter(_.closed)
            cnts.distinct.size == cnts.size &&
              closed.size <= 1 &&
              closed.forall(_.cnt == cnts.max) &&
              cnts.max == want(w)
        }
      } finally prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
}
