package graft.apps

import graft.dim.DimRouter
import graft.sinks.Sinks
import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The DimApp analog (ref app/dim/DimApp.java): a streaming query that
  * routes `topic_db` envelope lines into per-dimension parquet tables,
  * re-reading the routing config every micro-batch (the reference
  * CDC-streams + broadcasts it; at a handful of rows, a per-batch re-read
  * is simpler and at most one batch stale — fresher than the reference's
  * 1 h lookup cache).
  *
  * foreachBatch gives the batch-side writers (overwrite-per-table with
  * keep-latest-per-pk) exactly-once-per-batch semantics under the
  * streaming checkpoint.
  */
object DimApp {

  def run(rawLines: DataFrame, loadConfig: () => DataFrame, outDir: String,
      checkpoint: String): StreamingQuery =
    Sources.topicDb(rawLines)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val config = loadConfig() // per-batch refresh (S4)
        val rules = DimRouter.parseConfig(config)
        val routed = DimRouter.route(batch, config)
        Sinks.writeDim(DimRouter.dimFrames(routed, rules), outDir)
      }
      .start()
}
