package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document n-gram novelty — the training-data curation signal "how much
  * of this document already exists in earlier crawl snapshots?" (the
  * shingle-level complement of exact/near dedup: a doc can be 60% stale
  * without any single duplicate partner). For each document, counts its
  * distinct word-3-shingles and how many of them FIRST appeared in a
  * strictly earlier document (doc_id is the deterministic crawl order).
  * Downstream: drop or down-weight documents with high n_seen / n_sh.
  *
  * Scale shape: shingling is row-local (native distinctShingles, no
  * exchange); first-occurrence is ONE map-side-combinable min over the
  * shingle stream; the join back is an equi-join on the shingle key
  * (linear, not the q23 self-join); the final per-doc count is map-side
  * combinable. Heavy-hitter shingles fan into one reduce key only in the
  * min/groupBy (partial-agg absorbs them), never into a pair explosion.
  */
object Novelty {

  /** @param corpus rows of (doc_id, text)
    * @return (doc_id, n_sh, n_seen) for every doc with >= 3 tokens:
    *         distinct shingle count and how many of those shingles occur
    *         in some earlier doc — all BIGINT */
  def shingleNovelty(corpus: DataFrame): DataFrame = {
    val sh = Dedup.shingled(corpus)
    val first = sh.groupBy("sh").agg(min("doc_id").as("first_doc"))
    sh.join(first, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L)).as("n_seen"))
  }

  /** DuckDB replica over the shared shingle CTE chain (expects CTEs
    * `corpus` and `sh(doc_id, sh)` in scope). */
  def shingleNoveltySql(corpusShCte: String): String =
    s"""WITH $corpusShCte,
       | fst AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY 1)
       | SELECT s.doc_id, count(*) AS n_sh,
       |   CAST(sum(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
       | FROM sh s JOIN fst f USING (sh) GROUP BY 1"""
      .stripMargin.replace("\n", " ")
}
