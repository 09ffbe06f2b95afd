package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

/** Parquet table loaders for the driver-generated TPC-H-ish testdata
  * (see TESTDATA.md). All queries take the sf dir as a parameter so the
  * same code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench).
  *
  * At 100 TB these reads become partitioned-parquet scans on a cluster —
  * nothing here assumes single-file inputs: `spark.read.parquet(dir)`
  * works identically on a directory of thousands of files.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scan-width repair for a CPU-HEAVY consumer (optimization guide
    * §2.5, "input skew: one huge unsplittable file … repartition
    * immediately after the read"): the bench parquet files are written
    * as a SINGLE row group, so a scan — and any expensive projection
    * fused into it (envelope map building, winnow sketches) — runs as
    * ONE task however many cores the session has. Round-robin the read
    * across the default parallelism, but ONLY when the table actually
    * is below one scan split (size < spark.sql.files.maxPartitionBytes,
    * resolved via the Hadoop FS API so HDFS/S3 behave identically); a
    * table past one split width keeps its natural scan parallelism and
    * pays no extra exchange. Deliberately NOT applied in [[load]]: an
    * r15 full-tail A/B measured a blanket repartition as a net loss
    * (every cheap query pays one extra exchange; only scans that feed
    * real per-row CPU win), so only the measured CPU-bound call sites
    * opt in. */
  def loadWide(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = load(spark, dir, name)
    val bytes = sizeCache.computeIfAbsent(path, _ => {
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val st = fs.getFileStatus(p)
        // a directory table (the 100 TB layout) is taken as "large":
        // its scan parallelism comes from its many files/row groups
        if (st.isDirectory) Long.MaxValue else st.getLen
      } catch { case _: Throwable => Long.MaxValue }
    }).longValue()
    if (bytes < spark.sessionState.conf.filesMaxPartitionBytes)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  /** path → file length; metadata only, resolved once per table. */
  private val sizeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped as BOTH parquet physical types across driver
    * testdata generations: TIMESTAMP(NANOS) (Spark 4 reads it as LONG
    * under `spark.sql.legacy.parquet.nanosAsLong=true`, which
    * GraftSession.base and every harness builder set) and plain
    * TIMESTAMP(MICROS). Branch on the type actually read: longs are
    * nanos → truncate to µs; timestamps are µs already — cast through
    * the session zone so downstream time functions behave identically
    * in both generations. The DuckDB oracle mirrors with
    * `date_trunc('microseconds', ts)` (a no-op on µs data). */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** Shared numeric conventions that keep Spark results bit-identical to the
  * DuckDB oracle:
  *
  *  - Cross-row sums of doubles are NOT associative, so a parallel Spark
  *    aggregation and a sequential DuckDB one can differ in the last bits.
  *    Every money/value sum therefore goes through an exact
  *    `DecimalType` accumulator and is cast to double only at the end.
  *    Decimal addition is associative → deterministic at any parallelism,
  *    which also means the SAME code gives stable results on a
  *    1000-executor cluster.
  *  - `events.ts` is nanosecond-precision in parquet; Spark truncates to
  *    microseconds on read. Oracle SQL mirrors with
  *    `date_trunc('microseconds', ts)`.
  */
object Num {
  /** Exact sum of a double column: decimal accumulate, double out. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Raw-column decimal cast for exact arithmetic. NEVER cast a COMPUTED
    * double to decimal: Spark rounds via the shortest string repr while
    * DuckDB rounds a scaled multiply, and they disagree in the last ulps.
    * Cast raw columns first, then compute in exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact `sum(price * (1 - discount))` in decimal, double out. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(dec2(price) * (lit(1) - dec2(discount))).cast("double")

  /** Exact average: decimal sum cast to double, then double division —
    * decimal/decimal division scale rules differ across engines, double
    * division of identical operands does not. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)
}
