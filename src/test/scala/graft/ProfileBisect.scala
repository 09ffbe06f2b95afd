package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profile bisect (test scope): time one SparkEntry query under
  * an arbitrary set of conf overrides, to attribute production-profile
  * slowdowns to a specific knob. Usage:
  *   ProfileBisect <query> [k=v ...]
  * Prints 3 timed runs plus the total task count the query scheduled
  * (the local-overhead signal: 4096-partition stages schedule 4096
  * tasks regardless of data volume). */
object ProfileBisect {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val b = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    args.drop(1).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.shuffle.partitions")
      .foreach(k => println(s"$k=${s.conf.getOption(k).getOrElse("(default)")}"))
    s.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .groupBy("l_returnflag").count().count() // warm
    val fn = SparkEntry.queries(q)
    val acc = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          { acc.incrementAndGet(); () }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = e.stageInfo
          stages.add(s"${si.numTasks} tasks  ${si.name.take(90)}"); ()
        }
      })
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(s, "/root/testdata/sf0.1").count()
      println(f"${(System.nanoTime() - t0) / 1e9}%6.2f s  run$i")
    }
    Thread.sleep(500) // listener drain
    println(s"tasks_3runs=${acc.get}")
    if (args.contains("--plan")) {
      val df = fn(s, "/root/testdata/sf0.1")
      df.queryExecution.toRdd.count()
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    import scala.jdk.CollectionConverters._
    stages.asScala.groupBy(identity).toSeq
      .map { case (k, v) => (v.size, k) }.sortBy(-_._1)
      .take(12).foreach { case (n, k) => println(f"x$n%-3d $k") }
    s.stop()
  }
}
