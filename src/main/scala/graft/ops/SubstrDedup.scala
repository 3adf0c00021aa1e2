package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring detection over a text corpus — the
  * ExactSubstr pass of "Deduplicating Training Data Makes Language Models
  * Better" (Lee et al., ACL 2022): any K-token window whose content occurs
  * more than once ANYWHERE in the corpus (another doc or the same doc) is
  * duplicated; overlapping/adjacent duplicated windows merge into maximal
  * spans, the unit a training pipeline actually cuts.
  *
  * The paper builds a single suffix array — inherently one-machine. The
  * Spark-shaped equivalent keeps every stage an equi-key exchange:
  *
  *   1. positional tokens: one explode (doc_id, pos, token);
  *   2. token ids: [[Dedup.denseIds]] (broadcast dictionary <= 2M entries,
  *      range-partitioned join past that) — windows then carry 8 longs,
  *      never 8 strings (the paper's 8-token windows re-materialized as
  *      strings would amplify corpus bytes ~8x through the shuffle);
  *   3. window keys: K-1 `lead`s over (doc_id, pos) + a rolling polynomial
  *      fold mod P — one exchange on doc_id, codegen arithmetic;
  *   4. duplicated keys: groupBy(wkey) HAVING count >= 2 (map-side partial
  *      counts), then a semi-join marks duplicated positions — each window
  *      instance matches at most one key row, so no fan-out even for a
  *      window duplicated a billion times;
  *   5. span merge: the classic gaps-and-islands — windows at i and j
  *      (i < j) cover contiguous tokens iff j - i <= K, so a break is
  *      `i - lag(i) > K` and the island id is its running sum. Same
  *      doc_id exchange as stage 3.
  *
  * One pathological doc bounds a task in stages 3/5 (same note as
  * [[Sessionize]]; the asofBucketed two-level prefix pattern applies if a
  * corpus ever has single documents past ~10^8 tokens).
  *
  * Key collisions (two distinct windows, same fold mod P) are the standard
  * Rabin-Karp caveat: probability ~ n^2/P per bucket pair and VERIFIABLE
  * downstream; the fold is mirrored literally in the oracle SQL, so parity
  * is exact regardless.
  */
object SubstrDedup {

  /** Window length in tokens (the paper's unit is 50 BPE tokens; 8
    * whitespace tokens keeps the small-SF corpus non-degenerate). */
  val K = 8
  /** Rolling-fold base; acc < P = 2^31-1 keeps acc*B + tid < 2^52. */
  val B = 1000003L

  /** @return one row per maximal duplicated span:
    *   (doc_id, span_start, span_end, n_windows) — token positions,
    *   end exclusive, all BIGINT. */
  def dupSpans(corpus: DataFrame, k: Int = K): DataFrame = {
    require(k >= 2, s"window length must be >= 2: $k")
    val toks = corpus
      .select(col("doc_id"), filter(split(col("text"), " "), t => t =!= "").as("a"))
      .filter(size(col("a")) >= k)
    val ptoks = toks.select(col("doc_id"), posexplode(col("a")).as(Seq("i", "tok")))
    val ptt = ptoks.join(Dedup.vocab(ptoks.select("tok")), "tok")
      .select(col("doc_id"), col("i"), col("tid"))

    val wdoc = Window.partitionBy("doc_id").orderBy("i")
    val leadCols = (1 until k).map(j => lead(col("tid"), j).over(wdoc).as(s"_l$j"))
    val withLeads = ptt.select(
      (Seq(col("doc_id"), col("i"), col("tid")) ++ leadCols): _*)
    val wkey = (1 until k).foldLeft[org.apache.spark.sql.Column](col("tid")) {
      (acc, j) => pmod(acc * B + col(s"_l$j"), lit(Dedup.P))
    }
    // materialized once (r6): wins feeds the duplicated-key groupBy AND
    // the semi-join probe — without the cut each consumer re-executes the
    // tokenize explode + vocab join + K-1-lead window. One row per token
    // position, the same volume the window exchange already moved.
    val wins = withLeads.filter(col(s"_l${k - 1}").isNotNull)
      .select(col("doc_id"), col("i"), wkey.as("wkey"))
      .localCheckpoint(false)

    val dup = wins.groupBy("wkey").agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= 2).select("wkey")
    val dwins = wins.join(dup, Seq("wkey"), "left_semi").select("doc_id", "i")

    val brk = dwins.withColumn("_b",
      when(col("i") - lag(col("i"), 1).over(wdoc) > k, 1).otherwise(0))
    val isl = brk.withColumn("_g",
      sum(col("_b")).over(wdoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col("doc_id"), col("_g"))
      .agg(min(col("i")).cast("long").as("span_start"),
        (max(col("i")) + k).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** DuckDB replica of [[dupSpans]] over a `corpus(doc_id, text)` relation
    * string: same tokenization, same sorted-rank token ids, same fold, same
    * island break rule. */
  def dupSpansSql(corpusRelation: String, k: Int = K): String = {
    val leads = (1 until k).map(j => s"lead(tid, $j) OVER w AS l$j").mkString(", ")
    val fold = (1 until k).foldLeft("tid") { (acc, j) => s"(($acc * $B + l$j) % ${Dedup.P})" }
    s"""WITH corpus AS $corpusRelation,
       | tokarr AS (SELECT doc_id, a FROM (SELECT doc_id,
       |     list_filter(string_split(text, ' '), t -> t <> '') AS a FROM corpus)
       |   WHERE len(a) >= $k),
       | ptoks AS (SELECT doc_id, i, a[i+1] AS tok
       |   FROM (SELECT doc_id, a, unnest(range(len(a))) AS i FROM tokarr)),
       | svocab AS (SELECT tok, row_number() OVER (ORDER BY tok) AS tid
       |   FROM (SELECT DISTINCT tok FROM ptoks)),
       | ptt AS (SELECT doc_id, i, tid FROM ptoks JOIN svocab USING (tok)),
       | leads AS (SELECT doc_id, i, tid, $leads FROM ptt
       |   WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
       | wins AS (SELECT doc_id, i, $fold AS wkey FROM leads WHERE l${k - 1} IS NOT NULL),
       | dup AS (SELECT wkey FROM wins GROUP BY wkey HAVING count(*) >= 2),
       | dwins AS (SELECT doc_id, i FROM wins JOIN dup USING (wkey)),
       | brk AS (SELECT doc_id, i, CASE WHEN i - lag(i)
       |     OVER (PARTITION BY doc_id ORDER BY i) > $k THEN 1 ELSE 0 END AS b FROM dwins),
       | isl AS (SELECT doc_id, i, sum(b)
       |     OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS g FROM brk)
       | SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
       |   CAST(max(i) + $k AS BIGINT) AS span_end, count(*) AS n_windows
       | FROM isl GROUP BY doc_id, g""".stripMargin.replace("\n", " ")
  }
}
