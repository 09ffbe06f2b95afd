package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-gram language-model quality filtering — the CCNet stage (Wenzek
  * et al. 2020, "CCNet: Extracting High Quality Monolingual Datasets
  * from Web Crawl Data"): train a small LM on a trusted in-language
  * sample, score every document by how well the LM predicts it, and
  * split the corpus into head/middle/tail perplexity tertiles (CCNet
  * keeps head+middle for training and drops the tail).
  *
  *  - q140: bigram LM with add-one smoothing trained on the `lang='en'`
  *    slice (the "Wikipedia" stand-in), scored over every document.
  *    CCNet proper scores log-space perplexity; logs are libm-dependent
  *    (the q134 rule: JVM `Math.log` vs DuckDB `std::log` may differ in
  *    the last ulp), so the emitted score is the integer-exact
  *    linear-space surrogate: per-bigram fixed-point probability
  *    `ppm = ((c(v,w)+1) · 10⁶) div (c(v)+V)` and per-doc
  *    `score_ppm = (Σ ppm) div n_bigrams` — the arithmetic mean where
  *    perplexity uses the geometric; tertile MEMBERSHIP (the thing
  *    CCNet acts on) agrees except across pathologically-spread docs,
  *    and LmOpsSpec pins the ordering contract on fixtures.
  *
  * Tertile thresholds are computed from a SCORE HISTOGRAM, never a
  * global row sort: `score_ppm` lives in [0, 10⁶], so
  * `groupBy(score_ppm).count` is a ≤10⁶-row dimension-sized frame at
  * ANY corpus scale — the single-partition cumulative window over it is
  * bounded by the fixed-point resolution, not the data (same posture as
  * q128's bucket-totals window). Docs tied on a threshold score all
  * land in the same bucket — membership is a pure function of the
  * score, unlike ntile's arbitrary tie splits.
  *
  * Scale notes (100 TB): the LM table is vocab²-bounded (LM-scale, not
  * corpus-scale — the q135/BPE argument); the bigram stream joins it on
  * (v, w) and AQE broadcasts the count tables when they fit (the q112
  * tf⋈df posture — an unconditional broadcast hint would be wrong, the
  * vocabulary is unbounded). Everything else is map-side-combinable
  * aggregation; no global sort anywhere (bucketing is by value against
  * two broadcast thresholds).
  *
  * Ref: the reference filters records with per-row quality predicates
  * (gmall-realtime dwd status filters, BaseLogApp.java:60-90's dirty
  * side-output); a learned LM filter is the published scale-path
  * generalization a training-data pipeline runs in that slot.
  */
object LmOps {

  private val TrainLang = "en"
  private val Fp = 1000000L // fixed-point probability scale (ppm)

  /** (doc_id, lang, v, w) — one row per adjacent word pair, derived
    * from the split array with a per-row transform (no per-doc window
    * shuffle for adjacency). */
  private def bigrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
      // one-word docs have no bigrams; the guard also keeps the ANSI
      // element_at away from sequence(0, -1)'s descending surprise
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(sequence(0, size(ws) - 2),
          |  j -> struct(element_at(ws, j + 1) AS v,
          |              element_at(ws, j + 2) AS w))""".stripMargin)).as("bg"))
      .select(col("doc_id"), col("lang"), col("bg.v"), col("bg.w"))

  /** q140: per-doc LM score + head/middle/tail perplexity tertile.
    * Output: (doc_id, lang, n_bigrams, score_ppm, bucket). Docs with
    * fewer than two words have no bigrams and are out of scope (they
    * are what q26/q117's length rules catch). High score = well
    * predicted = "head", matching CCNet's low-perplexity head. */
  def lmPerplexityBuckets(s: SparkSession, d: String): DataFrame = {
    val bg = bigrams(s, d).localCheckpoint() // feeds LM counts + scoring
    val train = bg.filter(col("lang") === TrainLang)
    val cvw = train.groupBy("v", "w").agg(count(lit(1)).as("cnt_vw"))
    val cv = train.groupBy("v").agg(count(lit(1)).as("cnt_v"))
    // vocabulary size = distinct words of the training slice (both
    // positions — the last word of a doc occurs only as `w`)
    val vsz = train.select(col("v").as("word"))
      .union(train.select(col("w").as("word")))
      .agg(countDistinct(col("word")).as("vsz"))
    val scored = bg
      .join(cvw, Seq("v", "w"), "left")
      .join(cv, Seq("v"), "left")
      .crossJoin(broadcast(vsz))
      .withColumn("ppm", expr(
        s"((coalesce(cnt_vw, 0L) + 1L) * $Fp) div (coalesce(cnt_v, 0L) + vsz)"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ppm")).as("sum_ppm"))
      .withColumn("score_ppm", expr("sum_ppm div n_bigrams"))
      .drop("sum_ppm")
      .localCheckpoint() // feeds the histogram AND the final bucketing
    // tertile thresholds from the bounded score histogram
    val hist = scored.groupBy("score_ppm").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.orderBy("score_ppm")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val th = cum
      .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"))))
      .agg(
        min(when(col("cum") >= expr("n div 3"), col("score_ppm"))).as("t_lo"),
        min(when(col("cum") >= expr("(2 * n) div 3"), col("score_ppm")))
          .as("t_hi"))
    scored.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("score_ppm") >= col("t_hi"), "head")
          .when(col("score_ppm") >= col("t_lo"), "middle")
          .otherwise("tail"))
      .select("doc_id", "lang", "n_bigrams", "score_ppm", "bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q140_lm_perplexity_buckets" -> lmPerplexityBuckets)

  val oracle: Map[String, String] = Map(
    "q140_lm_perplexity_buckets" ->
      s"""WITH wd AS (
         |  SELECT doc_id, lang,
         |    unnest(string_split(text, ' ')) AS word,
         |    unnest(range(0, len(string_split(text, ' ')))) AS pos
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, lang, v, w FROM (
         |    SELECT doc_id, lang, word AS v,
         |      lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w
         |    FROM wd) WHERE w IS NOT NULL),
         |cvw AS (SELECT v, w, COUNT(*) AS cnt_vw FROM bg
         |        WHERE lang = '$TrainLang' GROUP BY v, w),
         |cv AS (SELECT v, COUNT(*) AS cnt_v FROM bg
         |       WHERE lang = '$TrainLang' GROUP BY v),
         |vs AS (SELECT COUNT(DISTINCT word) AS vsz FROM (
         |    SELECT v AS word FROM bg WHERE lang = '$TrainLang'
         |    UNION ALL
         |    SELECT w FROM bg WHERE lang = '$TrainLang')),
         |sc AS (
         |  SELECT doc_id, lang, COUNT(*) AS n_bigrams,
         |    CAST(SUM(((COALESCE(cnt_vw, 0) + 1) * $Fp)
         |      // (COALESCE(cnt_v, 0) + vsz)) AS BIGINT)
         |      // COUNT(*) AS score_ppm
         |  FROM bg LEFT JOIN cvw USING (v, w) LEFT JOIN cv USING (v), vs
         |  GROUP BY doc_id, lang, vsz),
         |h AS (SELECT score_ppm, COUNT(*) AS c FROM sc GROUP BY 1),
         |cm AS (SELECT score_ppm,
         |         SUM(c) OVER (ORDER BY score_ppm ROWS UNBOUNDED PRECEDING)
         |           AS cum
         |       FROM h),
         |th AS (SELECT
         |    MIN(CASE WHEN cum >= n // 3 THEN score_ppm END) AS t_lo,
         |    MIN(CASE WHEN cum >= (2 * n) // 3 THEN score_ppm END) AS t_hi
         |  FROM cm, (SELECT COUNT(*) AS n FROM sc))
         |SELECT doc_id, lang, n_bigrams, CAST(score_ppm AS BIGINT)
         |    AS score_ppm,
         |  CASE WHEN score_ppm >= t_hi THEN 'head'
         |       WHEN score_ppm >= t_lo THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM sc, th""".stripMargin)
}
