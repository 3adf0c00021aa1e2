package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (record linkage / entity resolution): noisy
  * strings matched against a canonical list by BLOCKING-key equi-join +
  * exact edit-distance refine — the standard two-stage shape (Fellegi-
  * Sunter blocking; Christen, "Data Matching" 2012) that replaces the
  * quadratic all-pairs comparison with per-block candidates.
  *
  * Scale shape: candidates come only from an equi-join on the block key
  * (prefix), so the comparison count is sum over blocks of |dirty_b|·
  * |clean_b|, never |dirty|·|clean|; a cheap length-band filter runs
  * before the O(len²) levenshtein; and the canonical side is a dimension
  * table (broadcast when small, shuffle otherwise — Spark's planner picks
  * via the usual threshold, nothing here forces either). A pathological
  * block (every title sharing one prefix) is the same hot-key problem as
  * everywhere else in this engine — cap or salt the block key; here the
  * prefix blocks are provably spread by construction.
  *
  * Determinism: levenshtein is an exact integer DP with identical unit-
  * cost semantics in Spark (`functions.levenshtein`) and DuckDB
  * (`levenshtein`), so matched pairs + distances hash-check exactly.
  */
object FuzzyMatch {

  /** Block-key prefix length; typos are planted PAST this prefix. */
  val BlockPrefix = 4
  /** Refine threshold (edit distance). */
  val MaxDist = 2L

  /** Generic form: `dirty(id, s)` probes `clean(title)`; emits every
    * (id, title, dist) with a shared `BlockPrefix`-char block, a length
    * delta within `maxDist`, and levenshtein(s, title) <= `maxDist`. */
  def blockedMatch(dirty: DataFrame, clean: DataFrame, maxDist: Long = MaxDist): DataFrame = {
    val d = dirty.withColumn("_blk", substring(col("s"), 1, BlockPrefix))
    val c = clean.withColumn("_blk", substring(col("title"), 1, BlockPrefix))
    d.join(c, "_blk")
      .filter(abs(length(col("s")) - length(col("title"))) <= maxDist)
      .filter(levenshtein(col("s"), col("title")) <= maxDist)
      .select(col("id"), col("title"),
        levenshtein(col("s"), col("title")).cast("long").as("dist"))
  }

  /** First-3-token "title" of a document text (the canonical entity). */
  private def titleCol(text: Column): Column =
    concat_ws(" ", slice(filter(split(text, " "), t => t =!= ""), 1, 3))

  /** q110 fixture: canonical side = distinct titles of ALL documents;
    * dirty side = every doc_id % 5 == 0 title with one character DELETED
    * at a deterministic position past the block prefix (so each probe is
    * exactly edit distance 1 from its source title, and blocking provably
    * keeps the truth pair). Both sides derive from the same formula the
    * oracle SQL states. */
  def docFuzzyMatch(corpus: DataFrame): DataFrame = {
    val titled = corpus.select(col("doc_id"), titleCol(col("text")).as("title"))
    val clean = titled.select("title").distinct()
    val long = titled
      .filter(col("doc_id") % 5 === 0 && length(col("title")) >= BlockPrefix + 4)
    val p = lit(BlockPrefix + 1) + pmod(col("doc_id"), length(col("title")) - (BlockPrefix + 1))
    val dirty = long.select(col("doc_id").as("id"),
      concat(col("title").substr(lit(1), p - 1),
        col("title").substr(p + 1, length(col("title")))).as("s"))
    blockedMatch(dirty, clean)
  }

  /** DuckDB replica over a `corpus(doc_id, text)` relation string: same
    * title/typo synthesis, same block + band + levenshtein refine. */
  def docFuzzyMatchSql(corpusRelation: String): String = {
    val title = "array_to_string(list_filter(string_split(text, ' '), t -> t <> '')[1:3], ' ')"
    s"""WITH corpus AS $corpusRelation,
       | titled AS (SELECT doc_id, $title AS title FROM corpus),
       | clean AS (SELECT DISTINCT title FROM titled),
       | long AS (SELECT doc_id, title FROM titled
       |   WHERE doc_id % 5 = 0 AND len(title) >= ${BlockPrefix + 4}),
       | dirty AS (SELECT doc_id AS id,
       |     substr(title, 1, p - 1) || substr(title, p + 1, len(title)) AS s
       |   FROM (SELECT doc_id, title,
       |       ${BlockPrefix + 1} + doc_id % (len(title) - ${BlockPrefix + 1}) AS p FROM long))
       | SELECT d.id, c.title, CAST(levenshtein(d.s, c.title) AS BIGINT) AS dist
       | FROM dirty d JOIN clean c
       |   ON substr(d.s, 1, $BlockPrefix) = substr(c.title, 1, $BlockPrefix)
       | WHERE abs(len(d.s) - len(c.title)) <= $MaxDist
       |   AND levenshtein(d.s, c.title) <= $MaxDist"""
      .stripMargin.replace("\n", " ")
  }
}
