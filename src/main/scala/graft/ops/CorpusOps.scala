package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a Common-Crawl-scale training pipeline runs
  * between dedup and training: line-level boilerplate removal (the
  * CCNet/C4 step that strips lines repeated across many pages — nav bars,
  * cookie banners, "subscribe" footers) and deterministic stratified
  * sampling (fixed-size per-group draws that are reproducible across
  * reruns and engines).
  *
  * All are exact-integer / exact-string operators, so each is
  * hash-checked against a DuckDB SQL replica (q69 / q70 / q71).
  */
object CorpusOps {

  // ---------------- line-level dedup (CCNet/C4 boilerplate removal) ----

  /** Planted boilerplate lines — deterministic, mirrored in the SQL. */
  val Boiler1 = "subscribe to our newsletter for updates"
  val Boiler2 = "copyright example site all rights reserved"

  /** The ONE whitespace-token definition (NULL-safe) that q69/q71 parity
    * rests on — the Spark and DuckDB token rules must change together. */
  private def toks: Column =
    filter(split(coalesce(col("text"), lit("")), " "), t => t =!= "")
  private val toksSqlExpr =
    "list_filter(string_split(COALESCE(text, ''), ' '), t -> t <> '')"

  /** The `documents` table has single-line texts, so the lined corpus is
    * synthesized identically in both engines: tokens re-chunked into
    * 8-token lines, then boilerplate lines planted — [[Boiler1]] prepended
    * for doc_id % 3 == 0, [[Boiler2]] appended for doc_id % 7 == 0 — and
    * joined with '\n'. Pure row-local column math (no shuffle). */
  def linedCorpus(docs: DataFrame): DataFrame = {
    val nLines = (size(toks) / 8).cast("int")
    // sequence(0, -1) would step BACKWARDS (Spark infers step -1), so the
    // empty-doc case short-circuits to an empty line array
    val body = when(nLines > 0,
      transform(sequence(lit(0), nLines - 1),
        i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")))
      .otherwise(array().cast("array<string>"))
    val withB1 = when(col("doc_id") % 3 === 0,
      concat(array(lit(Boiler1)), body)).otherwise(body)
    val withB2 = when(col("doc_id") % 7 === 0,
      concat(withB1, array(lit(Boiler2)))).otherwise(withB1)
    docs.select(col("doc_id"), array_join(withB2, "\n").as("text"))
  }

  /** DuckDB replica of [[linedCorpus]] (a derived-table string over
    * `documents`). Chunking uses 1-based inclusive list slices — the same
    * 8-token windows as the Spark `slice` calls. */
  val linedCorpusSql: String =
    s"""(WITH toks AS (SELECT doc_id,
       |   $toksSqlExpr AS ts
       |   FROM documents),
       | body AS (SELECT doc_id,
       |   list_transform(range(0, len(ts) // 8),
       |     i -> array_to_string(ts[i*8+1:i*8+8], ' ')) AS ls FROM toks),
       | planted AS (SELECT doc_id,
       |   CASE WHEN doc_id % 3 = 0 THEN list_concat(['$Boiler1'], ls) ELSE ls END AS ls1
       |   FROM body),
       | planted2 AS (SELECT doc_id,
       |   CASE WHEN doc_id % 7 = 0 THEN list_concat(ls1, ['$Boiler2']) ELSE ls1 END AS ls2
       |   FROM planted)
       | SELECT doc_id, array_to_string(ls2, chr(10)) AS text FROM planted2)"""
      .stripMargin.replace("\n", " ")

  /** Line-level dedup: a line that appears in >= `minDocs` DISTINCT
    * documents is boilerplate — remove every occurrence, keep the
    * remaining lines in their original order. Output
    * (doc_id, clean_text, n_removed).
    *
    * Scale shape (the CCNet step at 100 TB):
    *  1. line frequency = groupBy(line).agg(count_distinct(doc_id)) —
    *     Spark plans the distinct as a two-phase aggregate over
    *     (line, doc_id) pairs with map-side partial combine, so a hot
    *     boilerplate line contributes one pre-deduped pair per
    *     (partition, doc), not one row per occurrence.
    *  2. the boilerplate set joins back as a LEFT ANTI equi-join on the
    *     line — it is orders of magnitude smaller than the corpus, so AQE
    *     broadcasts it (at extreme scale a bloom filter of the set is the
    *     same plan with false-positive re-check).
    *  3. reassembly = groupBy(doc_id) + array_sort on (pos, line) — the
    *     one unavoidable shuffle, keyed by the table's natural key.
    * Every aggregate is map-side combinable; nothing is quadratic in the
    * hottest line. */
  def lineDedup(docs: DataFrame, minDocs: Int = 5): DataFrame = {
    // NULL text behaves as "" (one empty line), matching the SQL replica's
    // COALESCE — without it, size(split(NULL)) = -1 turns n_removed
    // negative and the doc vanishes from the explode side
    val textNN = coalesce(col("text"), lit(""))
    // materialized once (r6): lines feeds the boilerplate groupBy, the
    // anti-join probe, AND (as a per-doc count) the full-doc base below —
    // without the cut each consumer re-ran the corpus synth + explode.
    val lines = docs.select(col("doc_id"),
      posexplode(split(textNN, "\n")).as(Seq("pos", "line")))
      .localCheckpoint(false)
    val boiler = lines.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("line")
    val kept = lines.join(boiler, Seq("line"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
    // left join from the full doc list: a doc whose every line was
    // boilerplate still gets a row (empty clean_text, full n_removed).
    // n0 comes from the materialized lines (split of a non-null string
    // always yields >= 1 element, so every doc has >= 1 line row and the
    // per-doc line count == size(split(text))) — no third corpus pass.
    lines.groupBy("doc_id").agg(count(lit(1)).as("n0"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("n0") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** DuckDB replica of [[lineDedup]] over [[linedCorpusSql]]: the
    * boilerplate set is collected into one list scalar and the per-doc
    * filter runs as an order-preserving list_filter. */
  def lineDedupSql(minDocs: Int = 5): String =
    s"""WITH corpus AS (SELECT * FROM $linedCorpusSql c),
       | ln AS (SELECT doc_id, unnest(string_split(COALESCE(text, ''), chr(10))) AS line FROM corpus),
       | boiler AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS nd
       |   FROM ln GROUP BY 1) WHERE nd >= $minDocs),
       | bl AS (SELECT coalesce(list(line), CAST([] AS VARCHAR[])) AS dl FROM boiler)
       | SELECT doc_id,
       |   array_to_string(list_filter(string_split(COALESCE(text, ''), chr(10)),
       |     l -> NOT list_contains(dl, l)), chr(10)) AS clean_text,
       |   CAST(len(string_split(COALESCE(text, ''), chr(10)))
       |     - len(list_filter(string_split(COALESCE(text, ''), chr(10)),
       |         l -> NOT list_contains(dl, l))) AS BIGINT) AS n_removed
       | FROM corpus, bl""".stripMargin.replace("\n", " ")

  // ---------------- training-shard packing (distributed prefix sum) ----

  /** Assign every doc to a training shard of ~`budget` tokens, in
    * deterministic doc_id order: shard = floor(cum_tokens_before / budget)
    * (docs are not split; a doc straddling a boundary belongs to the shard
    * its first token lands in).
    *
    * The naive plan — `sum(ntok) OVER (ORDER BY doc_id)` — is a
    * single-partition global sort: every row through one reducer. This
    * runs the classic TWO-LEVEL PREFIX SUM instead:
    *  1. block = doc_id / blockSize; per-block token totals via groupBy —
    *     map-side combinable, output rows = n_docs/blockSize;
    *  2. exclusive running offset across the (tiny) block-total table —
    *     the only ordered scan, over blocks not docs;
    *  3. offsets broadcast-join back; within-block running sum via a
    *     window PARTITIONED BY block — partition size bounded by
    *     blockSize, so no reducer ever sees more than blockSize rows.
    * At 1e12 docs / blockSize 1e6 the ordered step touches 1e6 rows and
    * every other stage is an equi-join or bounded window.
    * Output (doc_id, n_tok, shard). */
  def packShards(docs: DataFrame, budget: Long, blockSize: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ntok = size(toks).cast("long")
    val d = docs.select(col("doc_id"), ntok.as("n_tok"),
      expr(s"CAST(doc_id DIV ${blockSize}L AS BIGINT)").as("_blk"))
    val blockTotals = d.groupBy("_blk").agg(sum(col("n_tok")).as("_bt"))
    val offsets = blockTotals.withColumn("_off",
      coalesce(sum(col("_bt")).over(
        Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_blk", "_off")
    val withinW = Window.partitionBy("_blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(offsets), Seq("_blk"))
      .withColumn("_cumBefore", col("_off") + coalesce(sum(col("n_tok")).over(withinW), lit(0L)))
      // integer DIV, not double `/`: a double quotient rounds once the
      // corpus-wide token total passes 2^53
      .select(col("doc_id"), col("n_tok"),
        expr(s"CAST(_cumBefore DIV ${budget}L AS BIGINT)").as("shard"))
  }

  def packShardsSql(budget: Long): String =
    s"""SELECT doc_id,
       | CAST(len($toksSqlExpr) AS BIGINT) AS n_tok,
       | CAST(COALESCE(SUM(len($toksSqlExpr))
       |   OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |   // $budget AS BIGINT) AS shard
       | FROM documents""".stripMargin.replace("\n", " ")

  // ---------------- exact distributed quantiles (histogram) -----------

  /** EXACT per-group discrete quantiles of an integer feature without a
    * global sort: the corpus collapses to a (group, value) histogram first
    * — one map-side-combinable aggregate whose output is bounded by the
    * number of DISTINCT feature values, not rows — then cumulative counts
    * run in a window whose partitions are those (small) per-group
    * histograms. pct p picks the smallest v with cum >= ceil(p*n/100)
    * (the lower discrete quantile, quantile_disc semantics).
    *
    * This is what "p50/p90/p99 document length per language" costs at
    * 100 TB when lengths are bounded integers: the only shuffle moves the
    * histogram. `percentile_approx` gives error bars; a naive
    * `ORDER BY v` window moves every row through one partition per group.
    * Output (group, pct, qval) — all exact integers. */
  def groupQuantiles(docs: DataFrame, valueCol: String, groupCol: String,
                     pcts: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100), s"bad pcts $pcts")
    // NULL feature values are excluded (in BOTH engines): Spark windows
    // order NULLS FIRST, DuckDB NULLS LAST — keeping them would break the
    // hash-parity contract, and a quantile of NULL is meaningless anyway.
    // The filter runs on the CAST value: a non-numeric string casts to
    // NULL silently in Spark and would sneak a v=NULL histogram row past
    // a pre-cast filter
    val vCast = col(valueCol).cast("long")
    val hist = docs.filter(vCast.isNotNull)
      .groupBy(col(groupCol).as("grp"), vCast.as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("grp").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("cnt").over(Window.partitionBy("grp")))
    cum.withColumn("pct", explode(array(pcts.map(p => lit(p.toLong)): _*)))
      // ceil(pct*n/100) in exact int64 (pct*n <= 100 * rowcount, no overflow
      // below ~9e16 rows)
      .withColumn("target", expr("CAST((pct * n + 99) DIV 100 AS BIGINT)"))
      .filter(col("cum") >= col("target") && col("cum") - col("cnt") < col("target"))
      .select(col("grp").as(groupCol), col("pct"), col("v").as("qval"))
  }

  def groupQuantilesSql(valueCol: String, groupCol: String, pcts: Seq[Int]): String = {
    val values = pcts.map(p => s"($p)").mkString(", ")
    s"""WITH hist AS (SELECT $groupCol AS grp, CAST($valueCol AS BIGINT) AS v,
       |   count(*) AS cnt FROM documents WHERE $valueCol IS NOT NULL GROUP BY 1, 2),
       | c AS (SELECT grp, v, cnt,
       |   SUM(cnt) OVER (PARTITION BY grp ORDER BY v
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |   SUM(cnt) OVER (PARTITION BY grp) AS n FROM hist),
       | q(pct) AS (VALUES $values)
       | SELECT grp AS $groupCol, CAST(pct AS BIGINT) AS pct, CAST(v AS BIGINT) AS qval
       | FROM c, q
       | WHERE cum >= (pct * n + 99) // 100 AND cum - cnt < (pct * n + 99) // 100"""
      .stripMargin.replace("\n", " ")
  }

  // ---------------- deterministic stratified sampling ----------------

  /** Engine-portable per-row draw: Knuth multiplicative hash in EXACT
    * int64 (doc_id pre-modded so the product never overflows — DuckDB
    * errors on BIGINT overflow where Java wraps). NOT xxhash64: the two
    * engines' hash functions differ. */
  private val DrawP = 2147483647L // 2^31 - 1, prime
  private def draw(id: Column): Column = pmod(pmod(id, lit(DrawP)) * lit(2654435761L), lit(DrawP))
  private def drawSqlExpr(id: String): String = s"(($id % $DrawP) * 2654435761) % $DrawP"

  /** Deterministic stratified sample: the `n` docs with the smallest draw
    * per group. Reproducible across reruns, engines, and partitionings
    * (the draw is a pure function of doc_id).
    *
    * Scale shape: [[TopKByScore]] bounded-heap PARTIAL aggregate — the
    * shuffle carries at most (#partitions x #groups x n) heap entries,
    * where the `row_number() over (partition by grp order by draw)` form
    * would shuffle and sort the full corpus. A 1e12-doc table sampled to
    * n=10k per language moves megabytes, not terabytes. */
  def stratifiedSample(docs: DataFrame, n: Int, groupCol: String = "lang"): DataFrame =
    docs.select(col(groupCol).as("grp"), col("doc_id"), draw(col("doc_id")).as("d"))
      .groupBy("grp")
      // score = -draw: TopKByScore keeps (score desc, id asc) = (draw asc,
      // doc_id asc), the same total order as the oracle's ORDER BY
      .agg(TopKByScore(-col("d"), col("doc_id"), n).as("topk"))
      .select(col("grp"), posexplode(col("topk")).as(Seq("p", "s")))
      .select(col("grp").as(groupCol), (col("p") + 1).cast("long").as("smp_rank"),
        col("s.nn_id").as("doc_id"), (-col("s.score")).cast("long").as("d"))

  def stratifiedSampleSql(n: Int, groupCol: String = "lang"): String =
    s"""SELECT $groupCol, CAST(rn AS BIGINT) AS smp_rank, doc_id, CAST(d AS BIGINT) AS d
       | FROM (SELECT $groupCol, doc_id, ${drawSqlExpr("doc_id")} AS d,
       |   row_number() OVER (PARTITION BY $groupCol ORDER BY ${drawSqlExpr("doc_id")}, doc_id) AS rn
       |   FROM documents)
       | WHERE rn <= $n""".stripMargin.replace("\n", " ")
}
