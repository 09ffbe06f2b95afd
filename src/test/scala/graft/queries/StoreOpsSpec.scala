package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q163–q166 contracts beyond the oracle: the rendezvous resize
  * guarantee at doc granularity, changelog/status cross-consistency,
  * and driver-side re-derivations of the TTL sweep and streaks.
  */
class StoreOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val M = 2147483647L
  private def weight(key: Long, i: Long): Long = {
    val u = ((key % M) * 1103515245L + i * 40503L + 12345L) % M
    u * u % M
  }
  private def pick(key: Long, n: Int): Long =
    (0 until n).map(i => (i.toLong, weight(key, i)))
      .maxBy { case (i, h) => (h, -i) }._1

  test("q163 resize moves docs ONLY to the new shard, ~1/(n+1) of them") {
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val moved = ids.filter(id => pick(id, 64) != pick(id, 65))
    assert(moved.nonEmpty && moved.length < ids.length / 65 * 3)
    moved.foreach(id => assert(pick(id, 65) == 64L))
    // aggregate view matches the driver-side assignment census
    val got = StoreOps.shardAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expected = ids.groupBy(pick(_, 64)).view.mapValues { ds =>
      (ds.length.toLong, ds.count(id => pick(id, 65) != pick(id, 64)).toLong)
    }.toMap
    assert(got == expected)
    assert(got.keySet.size == 64) // every shard occupied at 500 docs
  }

  test("q164 changelog rows are exactly q160's non-unchanged census") {
    val diff = LayoutOps.snapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val log = LayoutOps.changelogEmit(spark, sf).collect()
    val byOp = log.groupBy(_.getString(1)).view.mapValues(_.length.toLong)
    assert(byOp("insert") == diff("added"))
    assert(byOp("delete") == diff("removed"))
    assert(byOp("update") == diff("changed"))
    assert(log.length == diff("added") + diff("removed") + diff("changed"))
    log.foreach { r =>
      r.getString(1) match {
        case "insert" => assert(r.isNullAt(2) && !r.isNullAt(3))
        case "delete" => assert(!r.isNullAt(2) && r.isNullAt(3))
        case "update" => assert(!r.isNullAt(2) && !r.isNullAt(3) &&
          r.getString(2) != r.getString(3))
      }
    }
  }

  test("q165 purge census matches a driver-side sweep") {
    val ret = Map("view" -> 7L, "click" -> 14L, "error" -> 30L,
      "purchase" -> 365L, "signup" -> 365L)
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as tsu").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val anchor = ev.map(_._2).max
    val expected = ev.groupBy(_._1).view.mapValues { rows =>
      val cutoff = anchor - ret(rows.head._1) * 86400000000L
      val purge = rows.count(_._2 < cutoff).toLong
      (rows.length.toLong, purge, purge * 1000000L / rows.length)
    }.toMap
    val got = StoreOps.ttlSweep(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("q168 WAU equals the literal trailing-7-day distinct count") {
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) as d").collect()
      .map(r => (r.getLong(0),
        java.time.LocalDate.parse(r.getString(1)).toEpochDay))
    val present = rows.map(_._2).distinct.sorted
    val expected = present.map { w =>
      val dau = rows.filter(_._2 == w).map(_._1).distinct.length.toLong
      val wau = rows.filter(r => r._2 >= w - 6 && r._2 <= w)
        .map(_._1).distinct.length.toLong
      w -> ((dau, wau, dau * 1000000L / wau))
    }.toMap
    val got = StoreOps.rollingWau(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay,
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("q173 transition rows re-derive and rows of a state sum to ~1e6 ppm") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as tsu", "event_id",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).sliding(2)
        .collect { case Array(a, b) => (a, b) }
    }.toSeq.groupBy(p => p).view.mapValues(_.size.toLong).toMap
    val got = StoreOps.transitionMatrix(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
    assert(got.map { case (k, (n, _)) => k -> n }.toMap == expected)
    got.groupBy(_._1._1).values.foreach { rows =>
      val ppm = rows.map(_._2._2).sum
      assert(ppm <= 1000000L && ppm > 1000000L - rows.length)
    }
  }

  test("q178 KS statistic matches a literal two-sample scan") {
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("value", "CAST(to_date(ts) AS STRING) as d").collect()
      .map(r => (r.getDouble(0),
        java.time.LocalDate.parse(r.getString(1)).toEpochDay))
    val cutDay = rows.map(_._2).min + 15
    val s1 = rows.filter(_._2 < cutDay).map(_._1).sorted
    val s2 = rows.filter(_._2 >= cutDay).map(_._1).sorted
    val (n1, n2) = (s1.length.toLong, s2.length.toLong)
    val domain = (s1 ++ s2).distinct.sorted
    val stats = domain.map { v =>
      val d = math.abs(s1.count(_ <= v) * n2 - s2.count(_ <= v) * n1)
      (v, d)
    }
    val mx = stats.map(_._2).max
    val atValue = stats.filter(_._2 == mx).map(_._1).min
    val r = StoreOps.ksDrift(spark, sf).collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getLong(2) == mx * 1000000L / (n1 * n2))
    assert(r.getDouble(3) == atValue)
    assert(mx > 0, "windows differ somewhere")
  }

  test("q183 disorder census matches an arrival-order scan") {
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "event_id", "unix_micros(ts) as tsu")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def census(rs: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
      val ordered = rs.sortBy(_._1).map(_._2)
      val delays = ordered.zip(ordered.scanLeft(Long.MinValue)(math.max).init)
        .map { case (ts, prevMax) =>
          if (prevMax == Long.MinValue) 0L else math.max(0L, prevMax - ts) }
      val late = delays.count(_ > 0).toLong
      (ordered.length.toLong, late, delays.max, delays.sum,
        late * 1000000L / ordered.length)
    }
    val expected = rows.groupBy(_._1).view
      .mapValues(rs => census(rs.map(r => (r._2, r._3)))).toMap
    val got = StoreOps.disorderCensus(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
    // the generated stream is in-order by construction — the census
    // PROVING that (all-zero delays ⇒ watermark 0 retains everything)
    // is the operator's answer here, not a triviality
    assert(expected.values.forall(_._2 == 0L))
  }

  test("q183 censuses crafted disorder exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("disorder").toString
    // type A: event 3 is 90s late behind event 2; type B in order
    Seq(
      (1L, 1000000L, 1L, "A", 1.0, "{}"),
      (2L, 100000000L, 1L, "A", 1.0, "{}"),
      (3L, 10000000L, 1L, "A", 1.0, "{}"),   // 90s late
      (4L, 101000000L, 1L, "A", 1.0, "{}"),
      (5L, 1000000L, 2L, "B", 1.0, "{}"),
      (6L, 2000000L, 2L, "B", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "timestamp_micros(us) as ts", "user_id",
        "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StoreOps.disorderCensus(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5)))).toMap
    assert(got("A") == ((4L, 1L, 90000000L, 250000L)))
    assert(got("B") == ((2L, 0L, 0L, 0L)))
  }

  test("q166 streaks match a driver-side gaps-and-islands scan") {
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) as d").collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)).toEpochDay))
    val expected = rows.groupBy(_._1).view.mapValues { rs =>
      val days = rs.map(_._2).distinct.sorted
      // island lengths by splitting on gaps > 1
      val lens = days.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, day) => List((day, 1L))
        case ((last, len) :: t, day) if day == last + 1 => (day, len + 1) :: t
        case (acc, day) => (day, 1L) :: acc
      }.map(_._2)
      (days.length.toLong, lens.length.toLong, lens.max)
    }.toMap
    val got = StoreOps.activityStreaks(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }
}
