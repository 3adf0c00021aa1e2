package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the documents table — the inverted-index
  * join family (TF-IDF and BM25 scoring), the text-side complement of the
  * dense-vector ANN suite in [[Ann]].
  *
  * Shape (both scorers): postings are an equi-join on the token — never a
  * doc x doc comparison. Query tokens JOIN document postings ON tok,
  * partial-aggregating groupBy to the (query, doc) score, then the
  * bounded-heap [[TopKByScore]] per query (map-side combine; the shuffle
  * carries Q x k entries, not Q x N scored rows). Stopword/heavy-hitter
  * guard: tokens in more than half the corpus are dropped from the index
  * (df * 2 <= N) — the same role [[Dedup]]'s bucket caps play, and mirrored
  * literally in the oracle SQL. At 100 TB: postings shuffle once on tok
  * (skew bounded by the df cap), scores shuffle once on query_id.
  *
  * [[tfIdfTopK]] is integer-exact end to end (floor-scaled idf, integer
  * tf), so the full ranking is hash-checked against a DuckDB replica.
  * [[bm25TopK]] is the standard double-precision BM25 (Robertson idf,
  * k1/b length normalization) in the same plan shape; float group-sums are
  * order-nondeterministic across engines, so it is spec-checked against a
  * brute-force in-JVM reimplementation instead of the oracle (RetrievalSpec
  * pins ranking equality with a measured score-gap guard).
  */
object Retrieval {

  /** Topic-token moduli/multipliers for [[corpus]]: token j of a doc is
    * w{j}_{(doc_id * Mult(j) + j) % Mod(j)}, so its document frequency is
    * ~N/Mod(j) — a graded idf spectrum from very common (N/5) to rare
    * (N/223). The raw synthetic `documents.text` has a ~30-token
    * vocabulary where almost every token sits in over half the corpus
    * (pure stopwords under the df cap), so retrieval needs this
    * deterministic enrichment layer to be non-degenerate — same
    * formula-lives-once pattern as WebPagesSynth. */
  val TopicMod = Vector(5, 7, 11, 17, 29, 43, 67, 101, 151, 223)
  val TopicMult = Vector(7919L, 12553L, 17389L, 21617L, 27449L, 33391L, 39371L, 45481L, 51679L, 57901L)

  /** The retrieval corpus: documents.text + the graded topic tokens (token
    * j doubled when (doc_id + j) % 3 == 0, so the tf path is exercised). */
  def corpus(docs: DataFrame): DataFrame = {
    val frags = TopicMod.indices.map { j =>
      val tok = concat(lit(s" w${j}_"), ((col("doc_id") * TopicMult(j) + j) % TopicMod(j)).cast("string"))
      concat(tok, when((col("doc_id") + j) % 3 === 0, tok).otherwise(lit("")))
    }
    docs.select(col("doc_id"), col("lang"), concat(col("text") +: frags: _*).as("text"))
  }

  /** DuckDB replica of [[corpus]], usable as a FROM item. */
  val corpusSql: String = {
    val frags = TopicMod.indices.map { j =>
      val tok = s"' w${j}_' || CAST((doc_id * ${TopicMult(j)} + $j) % ${TopicMod(j)} AS VARCHAR)"
      s"$tok || CASE WHEN (doc_id + $j) % 3 = 0 THEN $tok ELSE '' END"
    }
    s"(SELECT doc_id, lang, text || ${frags.mkString(" || ")} AS text FROM documents)"
  }

  /** Scaled-idf numerator: weight(tok) = floor(IdfScale * N / df).
    * Exact on both engines: N, df < 2^31 so the double quotient's floor
    * cannot flip (|true - fp| < ulp << 1/df whenever the ratio is not an
    * exact integer, and exact integers divide exactly). */
  val IdfScale = 10000.0

  /** Default rank depth. */
  val K = 10

  private def toks(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))

  private def scalarJoin(df: DataFrame, scalar: DataFrame): DataFrame =
    Scalars.join(df, scalar)

  /** Integer-exact TF-IDF retrieval: for each query doc (doc_id % qmod = 0)
    * the top-k other docs by sum(tf_doc * idf_weight) over shared tokens,
    * ties by nn_id. Output: (query_id, rank, nn_id, score) — all BIGINT. */
  def tfIdfTopK(docs: DataFrame, k: Int = K, qmod: Int = 50): DataFrame = {
    // materialized once for its three consumers (df weights, query side,
    // candidate side) — same discipline as the dedup suite's capped tables
    val posting = toks(docs).localCheckpoint(false)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // df cap drops corpus-wide stopwords BEFORE the candidate join; the
    // weight table is tiny (vocab-sized) — broadcast to both consumers
    val w = broadcast(
      scalarJoin(posting.groupBy("tok").agg(count(lit(1)).as("df")), n)
        .filter(col("df") * 2 <= col("n_docs"))
        .select(col("tok"),
          floor(lit(IdfScale) * col("n_docs") / col("df")).cast("long").as("idfw")))
    val qt = posting.filter(col("doc_id") % qmod === 0)
      .select(col("doc_id").as("query_id"), col("tok"))
    val scores = qt.join(w, "tok")
      .join(posting.withColumnRenamed("doc_id", "nn_id"), "tok")
      .filter(col("nn_id") =!= col("query_id"))
      .groupBy("query_id", "nn_id")
      .agg(sum(col("tf") * col("idfw")).as("score"))
    scores.groupBy("query_id")
      .agg(TopKByScore(col("score"), col("nn_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "sc")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("sc.nn_id").as("nn_id"), col("sc.score").as("score"))
  }

  /** DuckDB replica of [[tfIdfTopK]] (same cap, same floor-scaled idf,
    * same tie-break). `src` is any FROM item with (doc_id, text) — pass
    * [[corpusSql]] to mirror the q83 registration. */
  def tfIdfTopKSql(k: Int = K, qmod: Int = 50, src: String = "documents"): String =
    s"""WITH toks AS (SELECT doc_id, tok, count(*) AS tf FROM
       |   (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
       |    FROM $src rdocs) GROUP BY doc_id, tok),
       | n AS (SELECT count(*) AS n_docs FROM $src rdocs2),
       | w AS (SELECT tok, CAST(floor($IdfScale * n.n_docs / df) AS BIGINT) AS idfw
       |   FROM (SELECT tok, count(*) AS df FROM toks GROUP BY tok) d, n WHERE df * 2 <= n.n_docs),
       | qt AS (SELECT doc_id AS query_id, tok FROM toks WHERE doc_id % $qmod = 0),
       | sc AS (SELECT q.query_id, d.doc_id AS nn_id, CAST(sum(d.tf * w.idfw) AS BIGINT) AS score
       |   FROM qt q JOIN w USING (tok) JOIN toks d USING (tok)
       |   WHERE d.doc_id <> q.query_id GROUP BY 1, 2)
       | SELECT query_id, rnk AS rank, nn_id, score FROM (
       |   SELECT query_id, nn_id, score,
       |     row_number() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id) AS rnk FROM sc)
       | WHERE rnk <= $k""".stripMargin.replace("\n", " ")

  /** Fixed-point scale for [[bm25TopKInt]]'s floor-scaled Robertson idf
    * AND its per-token contribution (two independent floors). */
  val Bm25Scale = 10000.0

  /** Integer-exact BM25 (k1 = 1.2, b = 0.75 hard-wired as the exact
    * rationals 12/10 and 3/4): the q83 discipline applied to the BM25
    * formula, so the FULL ranking is hash-checked against the DuckDB
    * replica — closing the one ranking family that was spec-only.
    *
    * Same plan shape as [[tfIdfTopK]]/[[bm25TopK]] (postings equi-join on
    * tok with the df cap, bounded-heap top-k). Scoring per (query, tok,
    * doc), all BIGINT:
    *  - idfw = floor(Bm25Scale * ln(1 + (N - df + 0.5)/(df + 0.5))) — the
    *    one float touchpoint; RetrievalSpec measures the distance of every
    *    realized idf from its floor boundary (>= 1e-6 at the test SFs,
    *    ~1e5 ulps of cross-engine ln divergence) so the floor cannot flip;
    *  - length norm as an exact integer quotient: with avgdl = sumdl/M
    *    (M = docs with >= 1 token), tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    *    == 22*tf*sumdl / (10*tf*sumdl + 3*sumdl + 9*dl*M) after clearing
    *    denominators — integer DIV (both engines truncate; all terms
    *    positive). Contribution = (idfw * 22*tf*sumdl) DIV (that), summed
    *    as BIGINT (order-independent).
    * Overflow headroom: idfw <= 1e4*ln(2N), so the widest product
    * idfw*22*tf*sumdl stays under 2^63 while tf*sumdl < ~4e12 — documents
    * corpora to ~1e10 total tokens; past that, rescale Bm25Scale. */
  def bm25TopKInt(docs: DataFrame, k: Int = K, qmod: Int = 50): DataFrame = {
    val posting = toks(docs).localCheckpoint(false) // 4 consumers, see tfIdfTopK
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val dl = posting.groupBy("doc_id").agg(sum("tf").as("dl"))
    val sc = dl.agg(sum("dl").as("sumdl"), count(lit(1)).as("m_docs"))
    val w = broadcast(
      scalarJoin(posting.groupBy("tok").agg(count(lit(1)).as("df")), n)
        .filter(col("df") * 2 <= col("n_docs"))
        .select(col("tok"),
          floor(lit(Bm25Scale) *
            log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
            .cast("long").as("idfw")))
    val qt = posting.filter(col("doc_id") % qmod === 0)
      .select(col("doc_id").as("query_id"), col("tok"))
    val scores = qt.join(w, "tok")
      .join(posting.withColumnRenamed("doc_id", "nn_id"), "tok")
      .filter(col("nn_id") =!= col("query_id"))
      .join(dl.withColumnRenamed("doc_id", "nn_id"), "nn_id")
      .transform(scalarJoin(_, sc))
      .withColumn("c", expr(
        "(idfw * 22 * tf * sumdl) DIV (10 * tf * sumdl + 3 * sumdl + 9 * dl * m_docs)"))
      .groupBy("query_id", "nn_id")
      .agg(sum(col("c")).as("score"))
    scores.groupBy("query_id")
      .agg(TopKByScore(col("score"), col("nn_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "sc")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("sc.nn_id").as("nn_id"), col("sc.score").as("score"))
  }

  /** DuckDB replica of [[bm25TopKInt]] (same floors, same cleared-
    * denominator integer quotient — `//` and Spark's DIV both truncate on
    * the all-positive terms — same tie-break). */
  def bm25TopKIntSql(k: Int = K, qmod: Int = 50, src: String = "documents"): String =
    s"""WITH toks AS (SELECT doc_id, tok, count(*) AS tf FROM
       |   (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
       |    FROM $src rdocs) GROUP BY doc_id, tok),
       | n AS (SELECT count(*) AS n_docs FROM $src rdocs2),
       | dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
       | scal AS (SELECT CAST(sum(dl) AS BIGINT) AS sumdl, count(*) AS m_docs FROM dl),
       | w AS (SELECT tok, CAST(floor($Bm25Scale * ln(1 + (n.n_docs - df + 0.5) / (df + 0.5))) AS BIGINT) AS idfw
       |   FROM (SELECT tok, count(*) AS df FROM toks GROUP BY tok) d, n WHERE df * 2 <= n.n_docs),
       | s AS (SELECT q.query_id, d.doc_id AS nn_id,
       |   CAST(sum((w.idfw * 22 * d.tf * scal.sumdl)
       |     // (10 * d.tf * scal.sumdl + 3 * scal.sumdl + 9 * dl.dl * scal.m_docs)) AS BIGINT) AS score
       |   FROM (SELECT doc_id AS query_id, tok FROM toks WHERE doc_id % $qmod = 0) q
       |   JOIN w USING (tok) JOIN toks d USING (tok) JOIN dl ON dl.doc_id = d.doc_id, scal
       |   WHERE d.doc_id <> q.query_id GROUP BY 1, 2)
       | SELECT query_id, rnk AS rank, nn_id, score FROM (
       |   SELECT query_id, nn_id, score,
       |     row_number() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id) AS rnk FROM s)
       | WHERE rnk <= $k""".stripMargin.replace("\n", " ")

  /** BM25 (k1/b defaults per Robertson-Sparck Jones): same inverted-index +
    * bounded-heap plan as [[tfIdfTopK]], double-precision scoring
    * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)),
    * contrib(t, d) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)).
    * Query-side tf is presence (standard for short queries). */
  def bm25TopK(docs: DataFrame, k: Int = K, qmod: Int = 50,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val posting = toks(docs).localCheckpoint(false) // 4 consumers, see tfIdfTopK
    val dl = posting.groupBy("doc_id").agg(sum("tf").as("dl"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val avg = dl.agg((sum("dl") / count(lit(1))).as("avgdl"))
    val w = broadcast(
      scalarJoin(posting.groupBy("tok").agg(count(lit(1)).as("df")), n)
        .filter(col("df") * 2 <= col("n_docs"))
        .select(col("tok"),
          log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)).as("idf")))
    val qt = posting.filter(col("doc_id") % qmod === 0)
      .select(col("doc_id").as("query_id"), col("tok"))
    val scores = qt.join(w, "tok")
      .join(posting.withColumnRenamed("doc_id", "nn_id"), "tok")
      .filter(col("nn_id") =!= col("query_id"))
      .join(dl.withColumnRenamed("doc_id", "nn_id"), "nn_id")
      .transform(scalarJoin(_, avg))
      .groupBy("query_id", "nn_id")
      .agg(sum(col("idf") * col("tf") * (k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))))
        .as("score"))
    scores.groupBy("query_id")
      .agg(TopKByScore(col("score"), col("nn_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "sc")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("sc.nn_id").as("nn_id"), col("sc.score").as("score"))
  }
}
