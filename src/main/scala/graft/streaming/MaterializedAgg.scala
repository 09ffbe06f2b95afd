package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** A CDC delta event: the per-row contribution of one changelog entry
  * to the maintained aggregate (insert: +1/+len(after); delete:
  * −1/−len(before); update: 0/len diff — the q164→q167 shapes). */
case class ChangeEvent(source: String, dDocs: Long, dChars: Long)

/** The maintained per-source aggregate row. */
case class SourceAgg(source: String, nDocs: Long, nChars: Long)

/** Streaming materialized-view maintenance — the q167 batch theorem
  * (delta-apply ≡ recompute) run as a STREAM: per-source (docs, chars)
  * aggregates live in keyed state, every changelog micro-batch folds
  * its deltas in, and the updated row is emitted per affected key per
  * batch (Update-mode semantics). Seeded with the base-snapshot
  * aggregates via initial state, the stream converges to exactly the
  * batch q167 result — MaterializedAggSpec replays q164's changelog
  * in chunks and asserts equality against the oracle-verified batch
  * path, including prefix consistency after every batch.
  *
  * Ref: this is the reference's DWS pattern — keyed state holding the
  * running aggregate, updated per record, emitted downstream
  * (DwsTradeSkuOrderWindow.java keyed reduce) — with the Maxwell
  * changelog (BaseDBApp topic_db) as the input stream.
  *
  * Scale: state is ONE (docs, chars) pair per aggregation key,
  * hash-partitioned by key (RocksDB in the production profile);
  * per-batch work is changelog-sized. This is the streaming analog of
  * never rescanning the base table.
  */
object MaterializedAgg {

  private def fold(source: String, rows: Iterator[ChangeEvent],
      state: GroupState[SourceAgg]): SourceAgg = {
    val cur = state.getOption.getOrElse(SourceAgg(source, 0L, 0L))
    val next = rows.foldLeft(cur) { (acc, e) =>
      SourceAgg(source, acc.nDocs + e.dDocs, acc.nChars + e.dChars)
    }
    state.update(next)
    next
  }

  /** Maintain aggregates over a (possibly streaming) grouped changelog,
    * seeded with the base-snapshot aggregates. */
  def maintain(changes: Dataset[ChangeEvent],
      initial: Dataset[SourceAgg]): Dataset[SourceAgg] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.source)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout,
        initial.groupByKey(_.source))(fold)
  }
}
