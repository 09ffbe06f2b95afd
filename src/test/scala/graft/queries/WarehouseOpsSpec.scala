package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q219–q222 re-derivations + the session-window merge-convention pin. */
class WarehouseOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("session_window: a gap of EXACTLY the timeout MERGES " +
    "(touching sessions coalesce — the convention the oracle mirrors)") {
    import spark.implicits._
    val df = Seq(
      (1L, 0L), (1L, 1800000000L), // gap == 30 min exactly
      (2L, 0L), (2L, 1799999999L), // just under
      (3L, 0L), (3L, 1800000001L)  // just over
    ).toDF("uid", "tsu").withColumn("ts", timestamp_micros(col("tsu")))
    val got = df
      .groupBy(col("uid"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n")).groupBy("uid")
      .agg(count(lit(1)).as("n_sessions")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) == 1L, "gap under the timeout merges")
    assert(got(3L) == 2L, "gap over the timeout splits")
    // THE convention the q221 oracle's strict `>` mirrors:
    assert(got(1L) == 1L, "gap of exactly the timeout merges")
  }

  test("q221 ≡ driver gaps-and-islands with the pinned convention") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS tsu").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exp = ev.groupBy(_._1).view.mapValues { es =>
      val ts = es.map(_._2).sorted
      val splits = ts.zip(ts.tail).count { case (a, b) =>
        b - a > 1800000000L
      }
      splits + 1L
    }.toMap
    val got = WarehouseOps.sessionWindow(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("q219: each granularity partitions the revenue") {
    val rows = WarehouseOps.timeRollup(spark, sf).collect()
    val byGid = rows.groupBy(_.getInt(0))
    assert(byGid.keySet == Set(3, 5, 6)) // (day)=011? no: see below
    // gid = g(day)*4 + g(week)*2 + g(month): (day) kept -> 0*4+1*2+1=3,
    // (week) -> 4+0+1=5, (month) -> 4+2+0=6
    val sums = byGid.view.mapValues(_.map(_.getLong(5)).sum).toMap
    assert(sums.values.toSet.size == 1, "all three rollups sum equal")
    val counts = byGid.view.mapValues(_.map(_.getLong(4)).sum).toMap
    assert(counts.values.toSet.size == 1)
  }

  test("q222 ≡ driver trimmed mean per priority") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0),
        JBD.valueOf(r.getDouble(1)).setScale(2, RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact))
    val exp = o.groupBy(_._1).view.mapValues { os =>
      val xs = os.map(_._2).sorted
      val lo = xs.length / 10
      val kept = xs.slice(lo, xs.length - lo)
      (kept.length.toLong, kept.sum / kept.length)
    }.toMap
    val got = WarehouseOps.trimmedMean(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp.toMap)
  }

  test("q220: audit flags match first-principles distinct ratios") {
    val got = WarehouseOps.encodingAudit(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    got.foreach { case (c, (nRows, nDist, flag)) =>
      assert(nRows == li.count())
      val dd = li.select(c).distinct().count()
      assert(nDist == dd, c)
      assert(flag == (dd * 100 <= nRows), c)
    }
    assert(got("l_returnflag")._3 && got("l_linestatus")._3)
  }

  test("q228 WoW identities: lag chain + ppm delta re-derived") {
    val rows = WarehouseOps.wowGrowth(spark, sf).collect()
    assert(rows.head.isNullAt(3) && rows.head.isNullAt(4))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(3) == a.getLong(2), "prev = predecessor cents")
        assert(b.getLong(4) ==
          (BigInt(b.getLong(2) - b.getLong(3)) * 1000000 /
            b.getLong(3)).toLong)
      case _ =>
    }
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("q234 skyline ≡ brute-force domination; frontier is a chain") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val p = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0),
        JBD.valueOf(r.getDouble(1)).setScale(2, RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact, r.getInt(2).toLong))
    val exp = p.filter { x =>
      !p.exists(y => y._2 <= x._2 && y._3 >= x._3 &&
        (y._2 < x._2 || y._3 > x._3))
    }.map(t => (t._1, t._2, t._3)).sortBy(t => (t._2, -t._3, t._1)).toSeq
    val got = WarehouseOps.skyline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == exp)
    // along the frontier, size strictly INCREASES with price (you pay
    // more only for more size), modulo equal-point duplicates
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._2 < b._2 && a._3 < b._3 ||
          (a._2 == b._2 && a._3 == b._3))
      case _ =>
    }
  }

  test("q235 mode ≡ driver frequency argmax with smallest-value ties") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_mktsegment",
        "CAST(floor(CAST(c_acctbal AS DECIMAL(12,2))) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exp = c.groupBy(_._1).view.mapValues { xs =>
      val freq = xs.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      val best = freq.maxBy { case (v, n) => (n, -v) }
      (best._2, best._1)
    }.toMap
    val got = WarehouseOps.modePerGroup(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp)
  }

  test("q236 ≡ driver per-user sequence scan; gaps exist (interleaved " +
    "producers)") {
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val exp = ev.groupBy(_._1).view.mapValues { es =>
      val ids = es.map(_._2).sorted
      val gaps = ids.zip(ids.tail).filter { case (a, b) => b - a > 1 }
      (ids.length.toLong, gaps.length.toLong,
        gaps.map { case (a, b) => b - a - 1 }.sum)
    }.toMap
    val got = WarehouseOps.idGaps(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == exp)
    assert(got.values.exists(_._2 > 0), "interleaving must show gaps")
  }
}
