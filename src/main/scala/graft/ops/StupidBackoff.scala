package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stupid-backoff trigram scoring (Brants et al., EMNLP 2007 — "Large
  * Language Models in Machine Translation"). Stupid backoff IS the
  * web-scale smoothing: it was invented because Kneser-Ney's normalized
  * discounts need global statistics that are expensive to distribute,
  * while S(w|context) = relative frequency, backed off by a constant
  * factor 0.4 when the n-gram is unseen, trains on trillions of tokens
  * with nothing but count tables ([[KneserNey]] builds the KN tables;
  * this is the scoring path actually used at corpus scale).
  *
  * Per scored position (each token with a full trigram context):
  *   - seen trigram:      floor(c3 · 1e6 / c2(w1,w2))
  *   - else seen bigram:  floor(c2(w2,w3) · 4e5 / c1(w2))     (0.4·S)
  *   - else:              floor(c1(w3) · 1.6e5 / T)           (0.4²·S)
  * — all BIGINT multiply-then-div (single floor per level, no float op),
  * summed per document. Widest product is count · 1e6 < 2^63 for
  * corpora under ~9e12 tokens.
  *
  * Scale shape: n-gram streams are ROW-LOCAL explodes of each doc's
  * token array (the [[KneserNey]] discipline — no window, no doc_id
  * exchange); the three count tables are map-side-combinable groupBys;
  * scoring is four equi-joins that each match at most one count row per
  * stream row (no fan-out, no caps needed) plus one broadcast scalar
  * (total tokens); the per-doc rollup is one partial-agg groupBy. */
object StupidBackoff {

  /** Probability scale: 1.0 == 1e6; backoff factor 0.4 folded in as
    * 400000 and 160000 so each level takes exactly one floor. */
  val ScaleU = 1000000L
  val Scale1 = 400000L
  val Scale2 = 160000L

  /** Train split: count tables come from docs with id % TrainMod != 0
    * (2/3 of the corpus) and EVERY doc is scored — held-out docs contain
    * unseen n-grams, so all three backoff levels actually fire (counts
    * trained on the scoring corpus itself would make c3 >= 1 always and
    * the backoff dead code). */
  val TrainMod = 3L

  /** @return (doc_id, n_scored, score_u) for every corpus doc. */
  def score(corpus: DataFrame): DataFrame = {
    val arr = corpus.select(col("doc_id"),
      filter(split(col("text"), " "), t => t =!= "").as("a"))
      .localCheckpoint(false) // consumers: uni/bi/tri count streams + scoring
    val train = arr.filter(col("doc_id") % TrainMod =!= 0)
    // count tables materialized once (r6): uni has three consumers (both
    // scoring joins + the total scalar) and bi two — each re-ran its full
    // train-corpus explode + groupBy per consumer. Vocab-bounded tables.
    val uni = train.select(explode(col("a")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
      .localCheckpoint(false)
    val bi = train.filter(size(col("a")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(a) - 1), i -> struct(a[i-1] AS w1, a[i] AS w2))")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
      .localCheckpoint(false)
    val tri = arr.filter(size(col("a")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(a) - 1), i -> struct(a[i-2] AS w1, a[i-1] AS w2, a[i] AS w3))")).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.w3").as("w3"))
      .localCheckpoint(false) // consumers: the trigram count table + scoring
    val triCnt = tri.filter(col("doc_id") % TrainMod =!= 0)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val total = uni.agg(sum("c1").as("t_tokens"))

    val scored = Scalars.join(
      tri
        .join(triCnt, Seq("w1", "w2", "w3"), "left")
        .join(bi.select(col("w1").as("w1"), col("w2").as("w2"), col("c2").as("c2_ctx")),
          Seq("w1", "w2"), "left")
        .join(bi.select(col("w1").as("w2"), col("w2").as("w3"), col("c2").as("c2_bo")),
          Seq("w2", "w3"), "left")
        .join(uni.select(col("w").as("w2"), col("c1").as("c1_w2")), Seq("w2"), "left")
        .join(uni.select(col("w").as("w3"), col("c1").as("c1_w3")), Seq("w3"), "left"),
      total)
      .select(col("doc_id"),
        when(col("c3").isNotNull, expr(s"c3 * ${ScaleU}L div c2_ctx"))
          .when(col("c2_bo").isNotNull, expr(s"c2_bo * ${Scale1}L div c1_w2"))
          // w3 itself may be out-of-vocabulary -> contributes 0
          .otherwise(expr(s"coalesce(c1_w3, 0L) * ${Scale2}L div t_tokens")).as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_scored"), sum("s").as("score_u"))
    corpus.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("score_u"), lit(0L)).as("score_u"))
  }

  /** DuckDB replica over a `corpus(doc_id, text)` relation string. */
  def scoreSql(corpusRelation: String): String =
    s"""WITH corpus AS $corpusRelation,
       | tokarr AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS a
       |   FROM corpus),
       | uni AS (SELECT w, count(*) AS c1
       |   FROM (SELECT unnest(a) AS w FROM tokarr WHERE doc_id % $TrainMod <> 0)
       |   GROUP BY w),
       | bi AS (SELECT w1, w2, count(*) AS c2 FROM (SELECT a[i] AS w1, a[i+1] AS w2
       |     FROM (SELECT a, unnest(range(1, len(a))) AS i FROM tokarr
       |       WHERE len(a) >= 2 AND doc_id % $TrainMod <> 0)) GROUP BY w1, w2),
       | tri AS (SELECT doc_id, a[i] AS w1, a[i+1] AS w2, a[i+2] AS w3
       |   FROM (SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS i FROM tokarr
       |     WHERE len(a) >= 3)),
       | tc AS (SELECT w1, w2, w3, count(*) AS c3 FROM tri
       |   WHERE doc_id % $TrainMod <> 0 GROUP BY w1, w2, w3),
       | tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t_tokens FROM uni),
       | sc AS (SELECT t.doc_id, CASE
       |     WHEN tc.c3 IS NOT NULL THEN tc.c3 * $ScaleU // bc.c2
       |     WHEN bb.c2 IS NOT NULL THEN bb.c2 * $Scale1 // u2.c1
       |     ELSE COALESCE(u3.c1, 0) * $Scale2 // tot.t_tokens END AS s
       |   FROM tri t
       |   LEFT JOIN tc ON tc.w1 = t.w1 AND tc.w2 = t.w2 AND tc.w3 = t.w3
       |   LEFT JOIN bi bc ON bc.w1 = t.w1 AND bc.w2 = t.w2
       |   LEFT JOIN bi bb ON bb.w1 = t.w2 AND bb.w2 = t.w3
       |   LEFT JOIN uni u2 ON u2.w = t.w2
       |   LEFT JOIN uni u3 ON u3.w = t.w3, tot),
       | pd AS (SELECT doc_id, count(*) AS n_scored, CAST(sum(s) AS BIGINT) AS score_u
       |   FROM sc GROUP BY doc_id)
       | SELECT d.doc_id, CAST(COALESCE(pd.n_scored, 0) AS BIGINT) AS n_scored,
       |   CAST(COALESCE(pd.score_u, 0) AS BIGINT) AS score_u
       | FROM corpus d LEFT JOIN pd USING (doc_id)"""
      .stripMargin.replace("\n", " ")
}
