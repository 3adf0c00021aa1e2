package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kneser-Ney count tables (Kneser & Ney, ICASSP 1995; Chen & Goodman
  * 1998) — the TYPE-count infrastructure every KN-smoothed n-gram LM is
  * trained from. Where [[LmScore]] uses raw TOKEN counts (bigram MLE),
  * KN's lower-order distribution asks a different question: how many
  * DISTINCT contexts does a word complete? "francisco" is frequent
  * (high c1) but continues almost nothing but "san" (n_left = 1), so KN
  * backs off to it far less than raw frequency suggests — the canonical
  * example. Per vocab word this emits the three ingredients:
  *
  *  - `c1`      — raw unigram token count,
  *  - `n_left`  — N1+(·w): distinct left-neighbor types (the KN
  *                lower-order numerator),
  *  - `n_right` — N1+(w·): distinct right types (the discount-mass
  *                normalizer for context w).
  *
  * All BIGINT — hash-checks against the DuckDB replica.
  *
  * Scale shape: bigrams are generated ROW-LOCALLY from each document's
  * token array (a `transform` over the array, no window, no doc_id
  * exchange — unlike [[LmScore]], which needs positions for its per-doc
  * scoring join, the KN tables only need the corpus-wide bigram multiset);
  * the bigram-TYPE table is one map-side-combinable groupBy, materialized
  * once for its two type-count consumers; every output is vocab-bounded,
  * never corpus-bounded. The unigram table is a second map-side groupBy.
  * Both distinct-type counts are exact (two-level aggregate, no sketch). */
object KneserNey {

  /** @return (tok, c1, n_left, n_right) for every vocab word. */
  def knCounts(corpus: DataFrame): DataFrame = {
    val arr = corpus.select(
      filter(split(col("text"), " "), t => t =!= "").as("a"))
      .localCheckpoint(false) // two consumers: unigram stream, bigram stream
    val c1 = arr.select(explode(col("a")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    // row-local bigrams; sequence(1, size-1) is guarded because Spark's
    // sequence(1, 0) steps DOWN by default instead of being empty
    val bt = arr.filter(size(col("a")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(a) - 1), i -> struct(a[i-1] AS w1, a[i] AS w2))")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2")).agg(count(lit(1)).as("c2"))
      .localCheckpoint(false) // two consumers: n_right by w1, n_left by w2
    val nRight = bt.groupBy(col("w1").as("tok")).agg(count(lit(1)).as("n_right"))
    val nLeft = bt.groupBy(col("w2").as("tok")).agg(count(lit(1)).as("n_left"))
    c1.join(nLeft, Seq("tok"), "left").join(nRight, Seq("tok"), "left")
      .select(col("tok"), col("c1"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
  }

  /** DuckDB replica over a `corpus(doc_id, text)` relation string: same
    * tokenization, same row-local bigram types, same left joins. */
  def knCountsSql(corpusRelation: String): String =
    s"""WITH corpus AS $corpusRelation,
       | tokarr AS (SELECT list_filter(string_split(text, ' '), t -> t <> '') AS a
       |   FROM corpus),
       | c1 AS (SELECT tok, count(*) AS c1
       |   FROM (SELECT unnest(a) AS tok FROM tokarr) GROUP BY tok),
       | bt AS (SELECT w1, w2 FROM (SELECT a[i] AS w1, a[i+1] AS w2
       |     FROM (SELECT a, unnest(range(1, len(a))) AS i FROM tokarr
       |       WHERE len(a) >= 2))
       |   GROUP BY w1, w2),
       | nr AS (SELECT w1 AS tok, count(*) AS n_right FROM bt GROUP BY w1),
       | nl AS (SELECT w2 AS tok, count(*) AS n_left FROM bt GROUP BY w2)
       | SELECT c1.tok, c1.c1,
       |   CAST(COALESCE(nl.n_left, 0) AS BIGINT) AS n_left,
       |   CAST(COALESCE(nr.n_right, 0) AS BIGINT) AS n_right
       | FROM c1 LEFT JOIN nl USING (tok) LEFT JOIN nr USING (tok)"""
      .stripMargin.replace("\n", " ")
}
