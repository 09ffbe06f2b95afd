package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession builders for the engine.
  *
  * `local()` — test/bench shape (local[N], N shuffle partitions).
  * `production()` — the 100 TB-shape defaults: AQE (runtime coalescing +
  * skew-join splitting replaces hand-tuned parallelism), RocksDB state
  * store for the big streaming dedup/join states (the reference's RocksDB
  * backend is commented out at e.g. DimApp.java:30-33 — here it's on),
  * and shuffle sizing meant to be overridden per cluster via --conf.
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    base(SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString))
      .getOrCreate()

  def production(): SparkSession =
    base(withProductionConfs(SparkSession.builder())).getOrCreate()

  /** The production() conf block applied to an arbitrary builder — lets
    * the local correctness gate run under the 100 TB profile (the
    * partition-count-invariance proof: decimal sums and integer math make
    * every oracle result independent of parallelism, so 4096-partition
    * plans must hash-match the 8-partition gate bit for bit). */
  def withProductionConfs(b: SparkSession.Builder): SparkSession.Builder =
    b
      // one-partition-per-core scheduling is left to the cluster manager;
      // shuffle partitions high enough that a 100 TB shuffle stays under
      // ~256 MB per partition, then AQE coalesces small ones at runtime
      .config("spark.sql.shuffle.partitions", "4096")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .config("spark.sql.files.maxPartitionBytes", (256L << 20).toString)

  private def base(b: SparkSession.Builder): SparkSession.Builder =
    b.withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP(NANOS) parquet (events table) reads as long; Tables.events
      // truncates ns→µs. Set here once so table loaders stay side-effect-free
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "zstd")
}
