package graft.streaming

import graft.TestSpark
import graft.sinks.Sinks
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

case class Detail(detail_id: String, order_id: String, amount: Double, ts: Long)
case class Info(info_order_id: String, user_id: String, its: Long)

/** J1/J2 streaming form (ref DwdTradeOrderDetail.java:183-188): the
  * stream-stream equi-join with watermark-bounded state, plus the K3
  * partitioned serving sink with partition pruning. */
class StreamJoinSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream-stream inner join matches rows across micro-batches (J1)") {
    implicit val ctx = spark.sqlContext
    val details = MemoryStream[Detail]
    val infos = MemoryStream[Info]
    val dWm = details.toDS()
      .withColumn("d_time", (col("ts") / 1000).cast("timestamp"))
      .withWatermark("d_time", "10 seconds")
    val iWm = infos.toDS()
      .withColumn("i_time", (col("its") / 1000).cast("timestamp"))
      .withWatermark("i_time", "10 seconds")
    // reference keeps join state 3 days (idle-state retention); here the
    // time-range constraint bounds it to 60 s of event time
    val joined = dWm.join(iWm,
      col("order_id") === col("info_order_id") &&
        col("i_time") >= col("d_time") - expr("interval 60 seconds") &&
        col("i_time") <= col("d_time") + expr("interval 60 seconds"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append).start()
    try {
      details.addData(Detail("d1", "o1", 10.0, 1000))
      q.processAllAvailable()
      assert(spark.table("ss_join").count() == 0) // info not arrived yet
      infos.addData(Info("o1", "u1", 2000)) // later batch, within range
      q.processAllAvailable()
      assert(spark.table("ss_join").count() == 1) // matched across batches
      infos.addData(Info("o2", "u2", 3000)) // no matching detail
      q.processAllAvailable()
      assert(spark.table("ss_join").count() == 1)
    } finally q.stop()
  }

  test("dws parquet sink partitions by dt and serving queries prune (K3)") {
    val dir = java.nio.file.Files.createTempDirectory("dws").toString
    val dws = Seq(
      ("2022-04-29 10:00:00", 5L), ("2022-04-30 11:00:00", 7L))
      .toDF("stt_s", "uv_ct")
      .select(to_timestamp(col("stt_s")).as("stt"), col("uv_ct"))
    Sinks.writeDwsBatch(dws, dir)
    val back = spark.read.parquet(dir)
    assert(back.columns.contains("dt"))
    val pruned = back.filter(col("dt") === 20220429)
    assert(pruned.count() == 1)
    // partition pruning visible in the plan: the dt predicate must be a
    // PartitionFilter on the scan (pruned at planning), not a post-scan
    // Filter over all partitions
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*dt".r.findFirstIn(plan).isDefined,
      plan.take(3000))
    assert(back.count() == 2)
  }
}

/** The production state-store configuration (GraftSession) must actually
  * run: a stateful streaming query under the RocksDB provider. */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dailyFirst runs on the RocksDB state store provider") {
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[KeyedEvent]
    val q = Dedup.dailyFirst(Dedup.withMsWatermark(mem.toDS()))
      .writeStream.format("memory").queryName("rocks_out")
      .outputMode("append").start()
    try {
      mem.addData(KeyedEvent("u1", 1000, "a"), KeyedEvent("u1", 2000, "b"))
      q.processAllAvailable()
      mem.addData(KeyedEvent("u1", 3000, "c")) // same day, state in RocksDB
      q.processAllAvailable()
      assert(spark.table("rocks_out").count() == 1)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

/** Skew.saltedJoin transparency + tombstone guard. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin returns exactly the plain join result") {
    val fact = (1 to 500).map(i => (i.toLong % 7, s"f$i")).toDF("k", "payload")
    val dim = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "dim_val")
    val plain = fact.join(dim, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val salted = graft.operators.Skew
      .saltedJoin(fact, dim, "k", saltFrom = col("payload"), salts = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 500) // every fact row matched exactly once
  }

  test("nonEmptyLines drops upsert-kafka tombstones (P12)") {
    val lines = Seq("""{"a":1}""", "", """{"b":2}""", "").toDF("value")
    assert(graft.sources.Sources.nonEmptyLines(lines).count() == 2)
  }
}
