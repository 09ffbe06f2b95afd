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
}
