package graft.sources

import graft.schemas.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source builders (SURVEY.md §2.1). Kafka sources are the production
  * path; the file/rate/memory variants exist so every pipeline is testable
  * offline — the transforms downstream are source-agnostic
  * `DataFrame => DataFrame`.
  */
object Sources {

  /** S1: Kafka topic as a string-value stream. Null records (tombstones)
    * become "" — the reference's custom deserializer behavior
    * (MyKafkaUtil.java:29-48). */
  def kafkaLines(spark: SparkSession, bootstrap: String, topic: String,
      groupId: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("kafka.group.id", groupId)
      .option("startingOffsets", "latest")
      .load()
      .select(coalesce(col("value").cast("string"), lit("")).as("value"))

  /** S3: the canonical `topic_db` Maxwell-envelope view shared by every
    * DWD-db job (MyKafkaUtil.getTopicDbDDL, MyKafkaUtil.java:91-100).
    * `pt` (PROCTIME()) becomes the micro-batch snapshot time. */
  def topicDb(lines: DataFrame): DataFrame =
    lines
      .withColumn("env", from_json(col("value"), Schemas.maxwellEnvelope))
      .withColumn("old_str", get_json_object(col("value"), "$.old"))
      .filter(col("env").isNotNull && col("env.table").isNotNull)
      .select(col("env.*"), col("old_str"),
        current_timestamp().as("pt"))

  /** S5-ish: a small dimension/lookup table from any batch source (the
    * reference's MySQL `base_dic` JDBC lookup with 1 h cache TTL,
    * MysqlUtil.java:5-27). Refreshing per micro-batch in foreachBatch is
    * strictly fresher than the reference's cache. */
  def lookupTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** P12: the ""-tombstone guard — upsert-kafka deletions arrive as
    * empty strings (ref OrderDetailFilterFunction.java:26-36); drop them
    * before JSON parsing. */
  def nonEmptyLines(lines: DataFrame): DataFrame =
    lines.filter(length(col("value")) > 0)

  /** Test replay source (S8 socket analog): batch lines frame. */
  def lines(spark: SparkSession, rows: Seq[String]): DataFrame = {
    import spark.implicits._
    rows.toDF("value")
  }

  /** Schema-evolution read: one frame over snapshot directories written
    * at different times with DIFFERENT (widening) schemas — the normal
    * state of a corpus accumulated over years, where later crawls carry
    * columns (quality scores, license tags) earlier ones predate.
    * `mergeSchema` reconciles footers by NAME across all inputs; rows
    * from snapshots that predate a column read as null there (filter
    * with `col.isNotNull` semantics downstream, never positional
    * access). Spark's default reads ONE footer and silently drops the
    * other snapshots' extra columns — which is why this wrapper exists
    * and SchemaEvolutionSpec pins the difference. */
  def readEvolved(spark: SparkSession, dirs: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
}
