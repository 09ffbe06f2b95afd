package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed suffix arrays — the EXACT substring-dedup scale path.
  *
  * q133 removes repeated spans at fixed n-gram granularity (the
  * approximation in Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better"); the exact method in that paper is a suffix
  * array over the corpus. This pack builds one distributively:
  *
  *  - [[suffixRanks]] (q136): the lexicographic rank of every suffix of
  *    every (capped) document, by prefix doubling — ⌈log₂ maxlen⌉
  *    rounds, each ONE distributed sort of (rank, rank-at-offset) pairs
  *    plus an equi-join to pull the offset rank. No suffix string is
  *    ever materialized: the corpus stays (doc, pos, 8-byte rank) rows,
  *    so 100 TB of text is ~3 columns × corpus-chars rows, shuffled
  *    ⌈log₂ maxlen⌉ times — the literature's DC3/prefix-doubling
  *    trade stated in DataFrame terms. The oracle materializes the
  *    suffix STRINGS and window-sorts them (`dense_rank OVER (ORDER BY
  *    substr(text, pos+1))`) — same answer, opposite algorithm, which
  *    is what makes the check meaningful.
  *  - [[longestRepeat]] (q137): per document, the length of the longest
  *    substring that occurs ≥ 2 times in the (capped) corpus with an
  *    occurrence in this document — max LCP between rank-adjacent
  *    suffixes, computed by binary lifting over the retained doubling
  *    levels (descending: if the level-L ranks at the current offset
  *    agree, the suffixes share ≥ L more characters). Clamped by
  *    remaining document length because equal TRUNCATED ranks at level
  *    L mean fully-equal suffixes, where the true LCP is min(len).
  *
  * Ranks are dense (0-based contiguous): each round assigns new ranks
  * by globally sorting the DISTINCT (r1, r2) pairs and zipping indices
  * in sorted-partition order — order-preserving, distributed, never a
  * single-partition window. Equal pairs keep equal ranks, so identical
  * cross-doc suffixes tie exactly like the oracle's dense_rank.
  *
  * The doc cap (default 100) bounds the oracle's string
  * materialization, same posture as q31/q105's `doc_id < 100` — the
  * Spark side is capped identically so both engines see one corpus.
  */
object SuffixOps {

  private val DocCap = 100
  private val MinRep = 20L // span length a dedup pass would act on

  /** (doc_id, pos, ch): one row per character of the capped corpus. */
  private def chars(s: SparkSession, d: String, cap: Int): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") < cap && length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0, length(text) - 1)")).as("p"))
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        expr("substring(text, p + 1, 1)").as("ch"))

  /** Append a contiguous 0-based index in the DataFrame's CURRENT order
    * (call on a just-sorted frame): `zipWithIndex` numbers partitions
    * in order, and a range-shuffled sort leaves partitions globally
    * ordered, so the indices are the global sort ranks. */
  private def zipOrdered(df: DataFrame, idxCol: String): DataFrame = {
    val schema = df.schema.add(idxCol, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** All doubling levels: (L, ranks of the length-L prefix of every
    * suffix), L = 1, 2, 4, … ≥ maxlen. The last level's ranks are the
    * full suffix ranks. Each level is localCheckpointed — the loop is
    * iterative and the lineage must not compound (kmeansTrain rule). */
  private[queries] def suffixLevels(
      s: SparkSession, d: String, cap: Int = DocCap): Seq[(Long, DataFrame)] = {
    val base = chars(s, d, cap)
    val alphabet = zipOrdered(
      base.select("ch").distinct().orderBy("ch"), "r")
    var ranks = base.join(alphabet, Seq("ch"))
      .select(col("doc_id"), col("pos"), col("r"))
      .localCheckpoint()
    val maxLen = Tables.documents(s, d).filter(col("doc_id") < cap)
      .agg(max(length(col("text")))).head().getInt(0).toLong
    val levels = Seq.newBuilder[(Long, DataFrame)]
    levels += ((1L, ranks))
    var len = 1L
    while (len < maxLen) {
      val offset = ranks.select(col("doc_id").as("odoc"),
        col("pos").as("opos"), col("r").as("or"))
      val pairs = ranks.join(offset,
        col("odoc") === col("doc_id") && col("opos") === col("pos") + len,
        "left")
        .select(col("doc_id"), col("pos"), col("r").as("r1"),
          coalesce(col("or"), lit(-1L)).as("r2"))
      val ids = zipOrdered(
        pairs.select("r1", "r2").distinct().orderBy("r1", "r2"), "nr")
      ranks = pairs.join(ids, Seq("r1", "r2"))
        .select(col("doc_id"), col("pos"), col("nr").as("r"))
        .localCheckpoint()
      len *= 2
      levels += ((len, ranks))
    }
    levels.result()
  }

  /** q136: (doc_id, pos, srank) — 1-based dense lexicographic rank of
    * the suffix starting at pos, identical suffixes sharing a rank. */
  def suffixRanks(s: SparkSession, d: String): DataFrame =
    suffixLevels(s, d).last._2
      .select(col("doc_id"), col("pos"), (col("r") + 1L).as("srank"))

  /** q137: per capped doc, the longest repeated span touching it and
    * how many of its positions start a repeat ≥ MinRep chars (the rows
    * a span-dedup pass like q133 would rewrite). */
  def longestRepeat(s: SparkSession, d: String): DataFrame = {
    val levels = suffixLevels(s, d)
    val full = levels.last._2
    val ordered = zipOrdered(
      full.orderBy(col("r"), col("doc_id"), col("pos")), "i")
      .select(col("doc_id"), col("pos"), col("i"))
      .localCheckpoint()
    // rank-adjacent pairs, keyed by the FIRST row's index
    var pairs = ordered.join(
      ordered.select(col("doc_id").as("bdoc"), col("pos").as("bpos"),
        (col("i") - 1L).as("i")),
      Seq("i"))
      .select(col("i"), col("doc_id").as("adoc"), col("pos").as("apos"),
        col("bdoc"), col("bpos"), lit(0L).as("off"))
    // binary lifting, highest level first
    levels.reverse.foreach { case (len, rk) =>
      val ra = rk.select(col("doc_id").as("xad"), col("pos").as("xap"),
        col("r").as("ar"))
      val rb = rk.select(col("doc_id").as("xbd"), col("pos").as("xbp"),
        col("r").as("br"))
      pairs = pairs
        .join(ra, col("xad") === col("adoc") &&
          col("xap") === col("apos") + col("off"), "left")
        .join(rb, col("xbd") === col("bdoc") &&
          col("xbp") === col("bpos") + col("off"), "left")
        .withColumn("off", when(col("ar").isNotNull &&
          col("ar") === col("br"), col("off") + len).otherwise(col("off")))
        .select("i", "adoc", "apos", "bdoc", "bpos", "off")
        .localCheckpoint()
    }
    val lens = Tables.documents(s, d).filter(col("doc_id") < DocCap)
      .select(col("doc_id"), length(col("text")).cast("long").as("dlen"))
    val lcps = pairs
      .join(broadcast(lens.select(col("doc_id").as("adoc"),
        col("dlen").as("alen"))), Seq("adoc"))
      .join(broadcast(lens.select(col("doc_id").as("bdoc"),
        col("dlen").as("blen"))), Seq("bdoc"))
      .select(col("i"),
        least(col("off"), col("alen") - col("apos"),
          col("blen") - col("bpos")).as("l"))
    // each row's repeat = max(LCP with rank-predecessor, with successor)
    ordered
      .join(lcps.select(col("i"), col("l").as("lnext")), Seq("i"), "left")
      .join(lcps.select((col("i") + 1L).as("i"), col("l").as("lprev")),
        Seq("i"), "left")
      .withColumn("v", greatest(coalesce(col("lnext"), lit(0L)),
        coalesce(col("lprev"), lit(0L))))
      .groupBy("doc_id")
      .agg(max(col("v")).as("longest_repeat"),
        sum(when(col("v") >= MinRep, 1L).otherwise(0L)).as("n_pos_rep"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q136_suffix_ranks" -> suffixRanks,
    "q137_longest_repeat" -> longestRepeat)

  private val posCte =
    s"""WITH p AS (
       |  SELECT doc_id, text, unnest(range(0, len(text))) AS pos
       |  FROM documents WHERE doc_id < $DocCap)""".stripMargin

  val oracle: Map[String, String] = Map(
    // The oracle takes the opposite algorithm on purpose: materialize
    // every suffix string and window-sort. Feasible only because of the
    // doc cap; the Spark side never builds a suffix string at all.
    "q136_suffix_ranks" -> s"""$posCte
      |SELECT doc_id, pos,
      |  CAST(dense_rank() OVER (ORDER BY substr(text, pos + 1)) AS BIGINT)
      |    AS srank
      |FROM p""".stripMargin,
    "q137_longest_repeat" -> s"""$posCte,
      |s AS (SELECT doc_id, pos, substr(text, pos + 1) AS suf FROM p),
      |o AS (SELECT doc_id, pos, suf,
      |        lead(suf) OVER (ORDER BY suf, doc_id, pos) AS nsuf
      |      FROM s),
      |lp AS (SELECT doc_id, pos, suf,
      |         LEAST(len(suf), len(nsuf)) AS ml,
      |         list_position(list_transform(
      |           range(1, LEAST(len(suf), len(nsuf)) + 1),
      |           j -> substr(suf, j, 1) = substr(nsuf, j, 1)), false) AS fp
      |       FROM o WHERE nsuf IS NOT NULL),
      |-- list_position yields 0 (not NULL) for "never false" here, so a
      |-- full-length match is NULLIF(fp,0) → ml
      |ln AS (SELECT doc_id, pos, suf,
      |         CAST(COALESCE(NULLIF(fp, 0) - 1, ml) AS BIGINT) AS lnext
      |       FROM lp
      |       UNION ALL
      |       SELECT doc_id, pos, suf, 0 FROM o WHERE nsuf IS NULL),
      |v AS (SELECT doc_id,
      |        GREATEST(lnext,
      |          COALESCE(lag(lnext) OVER (ORDER BY suf, doc_id, pos), 0))
      |          AS v
      |      FROM ln)
      |SELECT doc_id, CAST(MAX(v) AS BIGINT) AS longest_repeat,
      |  CAST(SUM(CASE WHEN v >= $MinRep THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_pos_rep
      |FROM v GROUP BY doc_id""".stripMargin)
}
