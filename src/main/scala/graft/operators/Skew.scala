package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators for hot keys at 100 TB (SURVEY.md §4 shuffle
  * notes). AQE's skew-join splitting (on in GraftSession) handles most
  * cases at runtime; these explicit forms are for the pathological ones —
  * a single key holding >1 partition of data.
  *
  * Both are TRANSPARENT: results equal the unsalted plan (salted
  * aggregation is oracle-checked as q47). Salts are deterministic hashes
  * of carrier columns, never `rand()` — repeatable under retries/replays.
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (keys, salt),
    * then final-aggregate on keys. Only associative aggregates may pass
    * through (sums/counts/min/max). `aggs` maps output name → (partial
    * agg of the input column, final agg of the partial column). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], sumCols: Seq[(String, Column)],
      saltFrom: Column, salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(saltFrom), lit(salts)))
    val partialAggs = sumCols.map { case (name, c) => sum(c).as(name) } :+
      count(lit(1)).as("_cnt")
    val partial = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sumCols.map { case (name, _) => sum(col(name)).as(name) } :+
      sum(col("_cnt")).as("row_count")
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted broadcast-free join for a skewed fact key: the dim side is
    * exploded `salts`× (one copy per salt), the fact side gets a
    * deterministic salt — so one hot key spreads over `salts` reducers.
    * Use when the dim is too big to broadcast AND the fact key is hot. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFrom: Column, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(hash(saltFrom), lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
