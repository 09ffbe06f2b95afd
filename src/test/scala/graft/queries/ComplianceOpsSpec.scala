package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q147 invariants beyond the oracle rows: redaction order (names
  * before bare numbers — the name contains digits), zero digit leak in
  * any redacted blob, and audit counts re-derived independently.
  */
class ComplianceOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q147 redacted blobs leak no digits and no customer names") {
    import spark.implicits._
    val events = spark.read.parquet(s"$sf/events.parquet")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    // re-derive the redaction driver-side and compare md5s
    val custMap = cust.select("c_custkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = events
      .selectExpr("event_id", "user_id",
        "CAST(round(value * 100) AS BIGINT) AS cents",
        "event_type", "props")
      .collect().flatMap { r =>
        custMap.get(r.getLong(1)).map { name =>
          val blob = s"user ${r.getLong(1)} ($name) spent ${r.getLong(2)}" +
            s" cents on ${r.getString(3)} props ${r.getString(4)}"
          val red = blob.replaceAll("Customer#[0-9]+", "[NAME]")
            .replaceAll("[0-9]+", "[N]")
          assert(!red.exists(_.isDigit), s"digit leak in: $red")
          assert(!red.contains("Customer#"))
          r.getLong(0) -> java.security.MessageDigest.getInstance("MD5")
            .digest(red.getBytes("UTF-8")).map("%02x".format(_)).mkString
        }
      }.toMap
    val got = ComplianceOps.piiRedact(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == want)
    assert(want.size == 1000)
  }

  test("q147 audit counts: every blob has exactly one name, numbers vary") {
    val rows = ComplianceOps.piiRedact(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == 1L, "exactly one Customer#N per blob")
      assert(r.getLong(2) >= 4L, "user id + name digits + cents + props k")
    }
  }
}
