package graft

import graft.sources.{Layers, OsmElements, WebPagesSynth => W}
import graft.ops.{Ann, Dedup, TextStats, TileAssign}

/** DuckDB oracle SQL for every SQL-expressible query in [[SparkEntry]].
  * Generated from the SAME Scala constants the Spark plans use (formulas
  * live once, in the sources/ops objects), so the two sides cannot drift.
  * All comparison outputs are BIGINT/VARCHAR; every float intermediate is
  * the identical IEEE op sequence on both engines.
  */
object Oracles {

  // ---- shared CTE fragments ----
  val entsCte: String =
    s"""ents AS (SELECT ${W.urlSql} AS url, k AS ent_idx, ${W.lonmSql("k")} AS lonm,
       |  ${W.latmSql("k")} AS latm, lang, pt AS text
       |  FROM (SELECT doc_id, ${W.pageTextSql} AS pt, lang,
       |        unnest(range(${W.nEntsSql})) AS k FROM documents) t)""".stripMargin.replace("\n", " ")

  val polysCte: String =
    s"polys AS (SELECT p_partkey AS poly_id, ${Layers.polyCxSql} AS cx, ${Layers.polyCySql} AS cy, " +
      s"${Layers.polyRSql} AS r FROM part)"

  val poisCte: String =
    s"pois AS (SELECT s_suppkey AS poi_id, ${Layers.poiXSql} AS px, ${Layers.poiYSql} AS py FROM supplier)"

  val eLon = "(e.lonm / 20.0 - 180.0)"
  val eLat = "(e.latm / 20.0 - 70.0)"
  def cellX(lon: String) = s"greatest(0, least(63, CAST(floor(($lon + 180.0) / 360.0 * 64.0) AS BIGINT)))"
  def cellY(lat: String) = s"greatest(0, least(63, CAST(floor(($lat + 90.0) / 180.0 * 64.0) AS BIGINT)))"
  val pipPred = s"abs($eLon - p.cx) + abs($eLat - p.cy) < p.r"

  val corpusToksCte: String =
    s"""corpus AS ${Dedup.corpusSql},
       |toks AS (SELECT DISTINCT doc_id, tok FROM
       |  (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok FROM corpus)),
       |vocab AS (SELECT tok, row_number() OVER (ORDER BY tok) AS tid FROM (SELECT DISTINCT tok FROM toks)),
       |tt AS (SELECT doc_id, tid FROM toks JOIN vocab USING (tok))""".stripMargin.replace("\n", " ")

  /** Word-3-shingle variant of the above (minhash runs on shingles). */
  val corpusShCte: String =
    s"""corpus AS ${Dedup.corpusSql},
       |tokarr AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS a FROM corpus),
       |sh AS (SELECT DISTINCT doc_id, sh FROM
       |  (SELECT doc_id, array_to_string(a[i+1:i+3], ' ') AS sh FROM
       |    (SELECT doc_id, a, unnest(range(len(a) - 2)) AS i FROM tokarr WHERE len(a) >= 3) x) y),
       |vocab AS (SELECT sh, row_number() OVER (ORDER BY sh) AS tid FROM (SELECT DISTINCT sh FROM sh)),
       |tt AS (SELECT doc_id, tid FROM sh JOIN vocab USING (sh))""".stripMargin.replace("\n", " ")

  val quantElsCte: String =
    s"""quant AS (SELECT vec_id, ${Ann.quantSqlExpr} AS q FROM embeddings),
       |els AS (SELECT vec_id, unnest(q) AS x, unnest(range(1, len(q) + 1)) AS i FROM quant)"""
      .stripMargin.replace("\n", " ")

  /** Same, over the planted-duplicate embedding corpus (near-dup query). */
  val quantElsCorpusCte: String =
    s"""ecorpus AS ${Ann.corpusSql},
       |quant AS (SELECT vec_id, ${Ann.quantSqlExpr} AS q FROM ecorpus),
       |els AS (SELECT vec_id, unnest(q) AS x, unnest(range(1, len(q) + 1)) AS i FROM quant)"""
      .stripMargin.replace("\n", " ")

  /** MinHash-LSH candidate pairs as CTEs over `tt` (from [[corpusShCte]]);
    * final relation `mh_pairs(doc_a, doc_b)`. Shared by q21 and q36. */
  val minhashPairsCtes: String = {
    val mins = (0 until Dedup.NumHashes).map(i =>
      s"min((tid * ${Dedup.HashA(i)} + ${Dedup.HashB(i)}) % ${Dedup.P}) AS m$i").mkString(", ")
    val bands = (0 until Dedup.Bands).map { b =>
      val key = (0 until Dedup.RowsPerBand).map(r => s"CAST(m${b * Dedup.RowsPerBand + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT $b AS band, $key AS bkey, doc_id FROM sigs"
    }.mkString(" UNION ALL ")
    // bucket-size cap mirrors Dedup.MaxBucketDefault (heavy-hitter guard,
    // on by default on the Spark side)
    s"""sigs AS (SELECT doc_id, $mins FROM tt GROUP BY doc_id),
       | rawbuckets AS ($bands),
       | bsz AS (SELECT band, bkey, count(*) AS n FROM rawbuckets GROUP BY band, bkey),
       | buckets AS (SELECT r.band, r.bkey, r.doc_id FROM rawbuckets r
       |   JOIN bsz USING (band, bkey) WHERE bsz.n <= ${Dedup.MaxBucketDefault}),
       | mh_pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM buckets a
       |   JOIN buckets b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)"""
      .stripMargin.replace("\n", " ")
  }

  // ---- per-query SQL ----
  val sql: Map[String, String] = Map(
    "q01_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        | count(*) AS n, CAST(min(l_orderkey) AS BIGINT) AS min_ok, CAST(max(l_orderkey) AS BIGINT) AS max_ok
        | FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "),

    "q02_join_topn" ->
      """SELECT c_mktsegment, rnk, o_orderkey FROM (
        |  SELECT c.c_mktsegment, o.o_orderkey,
        |    row_number() OVER (PARTITION BY c.c_mktsegment ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) WHERE rnk <= 3""".stripMargin.replace("\n", " "),

    "q03_window_events" ->
      """SELECT user_id, rnk, event_id FROM (
        |  SELECT user_id, event_id, row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
        |  FROM events) WHERE rnk <= 2""".stripMargin.replace("\n", " "),

    "q10_pages_extract" ->
      s"WITH $entsCte SELECT url, ent_idx, lonm, latm, lang FROM ents",

    "q11_text_passthrough" ->
      s"WITH $entsCte, $polysCte SELECT DISTINCT e.url, e.text FROM ents e JOIN polys p ON $pipPred",

    "q12_cell_assign" ->
      s"""WITH $entsCte SELECT url, ent_idx, cx, cy,
         | 1729382256910270464 + cx * 536870912 + cy AS cell_id
         | FROM (SELECT url, ent_idx, ${cellX(eLon)} AS cx, ${cellY(eLat)} AS cy FROM ents e) s"""
        .stripMargin.replace("\n", " "),

    "q13_pip_join" ->
      s"WITH $entsCte, $polysCte SELECT e.url, e.ent_idx, p.poly_id FROM ents e JOIN polys p ON $pipPred",

    "q14_pip_join_salted" ->
      s"WITH $entsCte, $polysCte SELECT e.url, e.ent_idx, p.poly_id FROM ents e JOIN polys p ON $pipPred",

    "q105_pip_str" ->
      s"WITH $entsCte, $polysCte SELECT e.url, e.ent_idx, p.poly_id FROM ents e JOIN polys p ON $pipPred",

    // grid-density clustering: dense-cell CC labels via recursive closure
    // (oracle scale); Spark side = star rounds over dense cells only
    "q106_grid_cluster" -> {
      import graft.ops.GridCluster
      val lvl = GridCluster.DefaultLevel
      val n = 1L << lvl
      s"""WITH RECURSIVE $entsCte,
         | pk AS (SELECT url, ent_idx,
         |   ${GridCluster.cellXSql(eLon, lvl)} * $n + ${GridCluster.cellYSql(eLat, lvl)} AS gkey
         |   FROM ents e),
         | ${GridCluster.labelCtesSql(lvl, GridCluster.DefaultMinPts)}
         | SELECT p.url, CAST(p.ent_idx AS BIGINT) AS ent_idx,
         |   CAST(coalesce(l.lbl, -1) AS BIGINT) AS cluster
         | FROM pk p LEFT JOIN lbl l USING (gkey)""".stripMargin.replace("\n", " ")
    },

    "q56_distance_join" ->
      s"""WITH $entsCte, $poisCte
         | SELECT e.url, e.ent_idx, p.poi_id FROM ents e JOIN pois p
         | ON ($eLon - p.px) * ($eLon - p.px) + ($eLat - p.py) * ($eLat - p.py)
         |    <= 1.03 * 1.03""".stripMargin.replace("\n", " "),

    // brute-force haversine dwithin; threshold constant sin^2(a/2) is
    // computed once in Scala and embedded as a literal so both engines
    // compare against the identical double. Boundary margin MEASURED and
    // pinned by DistanceJoinSpec ("q61 boundary margin"): the closest
    // synthetic pair sits 1.8e-6 = 1.4e14 ulps from havA at sf0.001 —
    // ~14 decimal orders beyond any cross-math-library sin/cos divergence
    // (last-ulp each), so the hash cannot flip across engines.
    "q61_dwithin_geodesic" -> {
      val a = 120000.0 / graft.ops.DistanceJoin.EarthRadiusM
      val havA = { val s = math.sin(a / 2); s * s }
      s"""WITH $entsCte, $poisCte
         | SELECT e.url, e.ent_idx, p.poi_id FROM ents e JOIN pois p
         | ON sin(radians($eLat - p.py) / 2) * sin(radians($eLat - p.py) / 2)
         |  + cos(radians($eLat)) * cos(radians(p.py))
         |    * sin(radians($eLon - p.px) / 2) * sin(radians($eLon - p.px) / 2)
         |  <= $havA""".stripMargin.replace("\n", " ")
    },

    "q15_knn" ->
      s"""WITH $entsCte, $poisCte,
         | d AS (SELECT e.url, e.ent_idx, p.poi_id,
         |   ($eLon - p.px) * ($eLon - p.px) + ($eLat - p.py) * ($eLat - p.py) AS d2
         |   FROM ents e CROSS JOIN pois p)
         | SELECT url, ent_idx, rnk AS knn_rank, poi_id FROM (
         |   SELECT url, ent_idx, poi_id, row_number() OVER (PARTITION BY url, ent_idx ORDER BY d2, poi_id) AS rnk
         |   FROM d) WHERE rnk <= ${Pipeline.K}""".stripMargin.replace("\n", " "),

    // brute-force haversine kNN: ordering by the haversine TERM (monotone
    // in central angle) — same formula shape as PoiGrid.hav; ties broken by
    // poi_id. sin/cos differ at most in the last ulp between engines, and
    // the synthetic layers have no near-degenerate distance ties, so the
    // ranking is stable (validated empirically at sf0.01 and sf0.1).
    "q59_knn_geodesic" ->
      s"""WITH $entsCte, $poisCte,
         | d AS (SELECT e.url, e.ent_idx, p.poi_id,
         |   sin(radians($eLat - p.py) / 2) * sin(radians($eLat - p.py) / 2)
         |   + cos(radians($eLat)) * cos(radians(p.py))
         |     * sin(radians($eLon - p.px) / 2) * sin(radians($eLon - p.px) / 2) AS hv
         |   FROM ents e CROSS JOIN pois p)
         | SELECT url, ent_idx, rnk AS knn_rank, poi_id FROM (
         |   SELECT url, ent_idx, poi_id, row_number() OVER (PARTITION BY url, ent_idx ORDER BY hv, poi_id) AS rnk
         |   FROM d) WHERE rnk <= ${Pipeline.K}""".stripMargin.replace("\n", " "),

    "q16_tiles" ->
      s"""WITH $entsCte SELECT url, ent_idx, CAST(${Pipeline.TileZ} AS BIGINT) AS tile_z,
         | ${TileAssign.tileXSql(eLon, Pipeline.TileZ)} AS tile_x,
         | ${TileAssign.tileYSql(eLat, Pipeline.TileZ)} AS tile_y FROM ents e""".stripMargin.replace("\n", " "),

    "q17_cell_counts" ->
      s"""WITH $entsCte SELECT cx, cy, count(*) AS n FROM
         | (SELECT ${cellX(eLon)} AS cx, ${cellY(eLat)} AS cy FROM ents e) s GROUP BY cx, cy"""
        .stripMargin.replace("\n", " "),

    "q80_quadkey" ->
      s"""WITH $entsCte SELECT url, ent_idx,
         | ${graft.ops.TileAssign.quadkeySql(
               graft.ops.TileAssign.tileXSql(eLon, Pipeline.TileZ),
               graft.ops.TileAssign.tileYSql(eLat, Pipeline.TileZ),
               Pipeline.TileZ)} AS quadkey
         | FROM ents e""".stripMargin.replace("\n", " "),

    "q81_focal_sum" ->
      s"""WITH $entsCte, cnt AS (SELECT cx, cy, count(*) AS n FROM
         | (SELECT ${cellX(eLon)} AS cx, ${cellY(eLat)} AS cy FROM ents e) s GROUP BY cx, cy)
         | ${graft.ops.Raster.focalSumSql()}""".stripMargin.replace("\n", " "),

    "q84_geohash" ->
      s"""WITH $entsCte,
         | ij AS (SELECT url, ent_idx, ${graft.ops.GeoHash.ixSql(eLon, 6)} AS ixx,
         |   ${graft.ops.GeoHash.iySql(eLat, 6)} AS iyy FROM ents e),
         | gg AS (SELECT url, ent_idx, ${graft.ops.GeoHash.mortonSql(6)} AS g FROM ij)
         | SELECT url, ent_idx, ${graft.ops.GeoHash.charsSql(6)} AS geohash FROM gg"""
        .stripMargin.replace("\n", " "),

    "q82_sessionize" -> graft.ops.Sessionize.sessionizeSql(),
    // the skew-safe variant must produce the SAME sessions — same oracle
    "q99_sessionize_skew" -> graft.ops.Sessionize.sessionizeSql(),

    // streaming replays: final streaming state vs the equivalent batch
    // query (q97's oracle is q82's SQL verbatim; q100's is q30's planted
    // set — the streaming recall contract through real state stores)
    "q95_stream_join" -> graft.streaming.StreamReplay.joinReplaySql(),
    "q96_stream_cms" -> graft.streaming.StreamReplay.cmsReplaySql(),
    "q97_stream_sessionize" -> graft.ops.Sessionize.sessionizeSql(),
    "q100_stream_dedup" ->
      """SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
        | FROM documents WHERE doc_id % 3 = 0""".stripMargin.replace("\n", " "),
    "q101_stream_ingest" -> graft.streaming.StreamReplay.ingestReplaySql,

    // plain theta join — correct by definition; the Spark side must get the
    // same rows through the bucketed equi-join + refine
    "q85_range_join" ->
      """SELECT e.event_id, p.range_id FROM
        | (SELECT event_id, (event_id * 7919) % 100000 AS pk FROM events) e JOIN
        | (SELECT CAST(p_partkey AS BIGINT) AS range_id, (p_partkey * 104729) % 100000 AS lo,
        |    (p_partkey * 104729) % 100000 + 5 + p_partkey % 20 AS hi FROM part) p
        | ON e.pk >= p.lo AND e.pk < p.hi""".stripMargin.replace("\n", " "),

    "q83_tfidf_topk" -> graft.ops.Retrieval.tfIdfTopKSql(k = 10, qmod = 50,
      src = graft.ops.Retrieval.corpusSql),

    "q98_bm25_topk" -> graft.ops.Retrieval.bm25TopKIntSql(k = 10, qmod = 50,
      src = graft.ops.Retrieval.corpusSql),

    "q151_kn_counts" ->
      graft.ops.KneserNey.knCountsSql(graft.ops.Retrieval.corpusSql),

    "q155_stupid_backoff" ->
      graft.ops.StupidBackoff.scoreSql(graft.ops.Retrieval.corpusSql),

    "q86_pagerank" -> graft.ops.LinkGraph.pageRankSql(),

    "q103_triangles" -> graft.ops.LinkGraph.trianglesSql,

    // BFS hop distance: capped recursive closure, min depth per node
    "q108_bfs_hops" -> graft.ops.LinkGraph.bfsSql(),

    // weighted SSSP: same closed-form edges + weights, cost-carrying
    // capped recursive closure, min cost per node
    "q120_sssp" -> graft.ops.LinkGraph.ssspSql(),

    // polyline length per url: same lag window, same IEEE op sequence
    "q109_track_length" -> graft.ops.GeoMeasure.trackLengthSql(entsCte, eLon, eLat),

    // blocked fuzzy match: same title/typo synthesis, same levenshtein
    "q110_fuzzy_match" ->
      graft.ops.FuzzyMatch.docFuzzyMatchSql("(SELECT doc_id, text FROM documents)"),

    // bigram LM score: same lead-window bigrams, same floor/scale sequence
    "q111_lm_score" ->
      graft.ops.LmScore.lmScoreSql("(SELECT doc_id, text FROM documents)"),

    // hex binning: same exact-literal constants, op order, and branches
    "q112_hex_counts" -> graft.ops.HexGrid.hexCountsSql(entsCte, eLon, eLat),

    // ring validation: verdicts recomputed from the vertex table (shoelace
    // + closure + duplicate + sign()-crossing self-join), integer-exact
    "q113_geom_validate" -> graft.ops.GeoValidate.validateSql,

    // segment crossing join: quadratic scan, identical orientation signs
    "q114_segment_join" -> graft.ops.SegmentJoin.joinSql,

    // overlay area: quadratic scan, identical integer rectangle overlap
    "q115_overlay_area" -> graft.ops.OverlayJoin.intersectionAreaSql,

    // Hilbert: the same rotate/reflect fold, one CTE stage per level
    "q116_hilbert" -> graft.ops.HilbertCurve.entityHilbertSql(entsCte),

    // Moran's I: same lattice, same N-scaled deviations, same queen join
    "q117_moran" -> graft.ops.SpatialStats.moranNumeratorsSql(entsCte, eLon, eLat),

    // LISA: per-cell deviation + queen lag + quadrant, same CTE prefix
    "q118_local_moran" -> graft.ops.SpatialStats.localMoranSql(entsCte, eLon, eLat),

    // join counts: B/W surface + directed class-pair adjacency counts
    "q119_join_counts" -> graft.ops.SpatialStats.joinCountsSql(entsCte, eLon, eLat),

    // Gi*: inclusive-neighborhood sums + N-scaled numerator and sign
    "q121_getis_ord" -> graft.ops.SpatialStats.getisOrdSql(entsCte, eLon, eLat),

    // DBSCAN: same coord collapse + block pair join + recursive closure CC
    "q131_geary" -> graft.ops.SpatialStats.gearyNumeratorsSql(entsCte, eLon, eLat),

    "q122_dbscan" -> graft.ops.PointPattern.dbscanSql(entsCte),

    // Ripley's K: same pair CTE at r_max, per-radius weighted sums - T
    "q123_ripley_k" -> graft.ops.PointPattern.ripleySql(entsCte),

    // 1-NN distance: quadratic coord self-join (fine at oracle scale)
    "q124_nn_dist" -> graft.ops.PointPattern.nnDistanceSql(entsCte),

    // KDE surface: same 5x5 window, same integer kernel
    "q125_kde" -> graft.ops.KernelDensity.surfaceSql(entsCte),

    // trail segmentation: same lag + running-sum windows, same threshold
    "q126_trail_segments" -> graft.ops.GeoMeasure.trailSegmentsSql(entsCte),

    // cross-K: class-split coord collapses, one blocked join at r_max
    "q127_cross_k" -> graft.ops.PointPattern.crossKSql(entsCte, "e.lang", "en"),

    // centrography: per-lang moment sums (HUGEINT casts)
    "q128_centrography" -> graft.ops.Centrography.summarySql(entsCte),

    // OD flows: same edges + k=0 location + clamped cell math
    "q129_od_flows" -> graft.ops.FlowMap.odFlowsSql(),

    // Mann-Kendall: same integer cells/day buckets, zero-filled domain
    "q130_mann_kendall" -> graft.ops.SpaceTime.mannKendallSql(),

    "q132_spatial_markov" -> graft.ops.SpaceTime.spatialMarkovSql(),

    "q133_hausdorff_pairs" -> graft.ops.TrajectorySim.hausdorffPairsSql(entsCte),

    "q134_map_match" -> graft.ops.MapMatch.snapSql(entsCte, graft.ops.SegmentJoin.segmentsASql),

    "q136_novelty" -> graft.ops.Novelty.shingleNoveltySql(corpusShCte),

    "q137_areal_interp" -> graft.ops.ArealInterp.toTargetGridSql(entsCte),

    "q138_st_dbscan" -> graft.ops.StDbscan.clusterSql(),

    "q139_collocations" -> graft.ops.Collocations.pmiPairsSql(),

    "q140_cohort_retention" -> graft.ops.Cohorts.retentionSql(),

    "q141_kcore" -> graft.ops.LinkGraph.kCoreSql(),

    "q142_funnel" -> graft.ops.Funnel.depthSql(),

    "q143_gravity_flows" -> graft.ops.FlowMap.gravityResidualsSql(),

    "q144_simhash_hamming" -> graft.ops.HammingDedup.hammingPairsSql(),

    "q145_contact_pairs" -> graft.ops.ContactJoin.companionsSql(),

    "q146_hits" -> graft.ops.LinkGraph.hitsSql(),

    "q147_trustrank" -> graft.ops.LinkGraph.trustRankSql(),

    "q148_assortativity" -> graft.ops.LinkGraph.assortativitySql(),

    "q149_cocitation" -> graft.ops.LinkGraph.coCitationSql(),

    "q150_salsa" -> graft.ops.LinkGraph.salsaSql(),

    "q152_hyperanf" -> graft.ops.HyperAnf.anfSql(),

    "q153_bowtie" -> graft.ops.LinkGraph.bowTieSql(),

    "q154_host_graph" -> graft.ops.HostGraph.hostGraphSql(),

    "q157_idw_surface" -> graft.ops.IdwSurface.idwSql(),

    "q158_link_delta" -> graft.ops.HostGraph.linkDeltaSql(),

    "q159_robots_filter" -> graft.ops.Robots.verdictsSql(),

    "q160_pagerank_incremental" -> graft.ops.LinkGraph.pageRankIncrementalSql(),

    "q161_temperature_sample" -> graft.ops.Mixing.temperatureSampleSql(),

    "q135_dissolve_area" -> graft.ops.Dissolve.unionAreaSql(
      s"(SELECT a_id % 5 AS cls, u0, u1, v0, v1 FROM ${graft.ops.OverlayJoin.squaresASql} q)"),

    "q104_heavy_hitters" -> graft.ops.HeavyHitters.tokenHeavyHittersSql(),

    "q88_cms_sketch" -> graft.ops.Sketches.cmsHeavyHittersSql(minCount = 50,
      src = graft.ops.Retrieval.corpusSql),

    "q89_hll_registers" -> graft.ops.Sketches.hllRegistersSql(
      src = graft.ops.Retrieval.corpusSql),

    "q94_bloom_membership" -> graft.ops.Sketches.bloomContaminationSql(
      src = graft.ops.Retrieval.corpusSql),

    "q90_robust_outliers" -> graft.ops.Outliers.robustOutliersSql(),

    "q93_sampled_quantiles" -> graft.ops.Outliers.sampledQuantilesSql(
      keep = 2147483647L / 2, pcts = Seq(50, 90, 99)),

    "q91_rollup" ->
      """SELECT coalesce(lang, '<all>') AS lang, coalesce(source, '<all>') AS source,
        | CAST(GROUPING(lang, source) AS BIGINT) AS gid,
        | count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        | FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin.replace("\n", " "),

    "q53_asof_join" ->
      """SELECT l.event_id, l.user_id, r.event_id AS view_id
        | FROM (SELECT * FROM events WHERE event_type = 'click') l
        | ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') r
        | ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin.replace("\n", " "),

    "q54_extent" ->
      s"""WITH $polysCte SELECT poly_id % 5 AS grp,
         | CAST(floor(MIN(cx - r) * 1000) AS BIGINT) AS minx,
         | CAST(floor(MIN(cy - r) * 1000) AS BIGINT) AS miny,
         | CAST(floor(MAX(cx + r) * 1000) AS BIGINT) AS maxx,
         | CAST(floor(MAX(cy + r) * 1000) AS BIGINT) AS maxy
         | FROM polys GROUP BY 1""".stripMargin.replace("\n", " "),

    "q55_overlay_join" ->
      s"""WITH $polysCte,
         | polysb AS (SELECT c_custkey AS polyb_id, ${Layers.polyBCxSql} AS cx,
         |   ${Layers.polyBCySql} AS cy, ${Layers.polyBRSql} AS r FROM customer)
         | SELECT a.poly_id AS a_id, b.polyb_id AS b_id FROM polys a JOIN polysb b
         | ON abs(a.cx - b.cx) + abs(a.cy - b.cy) <= a.r + b.r"""
        .stripMargin.replace("\n", " "),

    "q51_rasterize" ->
      s"""WITH $polysCte, ${graft.ops.Raster.coveredCteSql}
         | SELECT poly_id, CAST(${Pipeline.TileZ} AS BIGINT) AS tile_z,
         |  ${TileAssign.tileXSql("(ix / 20.0)", Pipeline.TileZ)} AS tile_x,
         |  ${TileAssign.tileYSql("(iy / 20.0)", Pipeline.TileZ)} AS tile_y,
         |  count(*) AS n_pixels
         | FROM covered GROUP BY 1, 2, 3, 4""".stripMargin.replace("\n", " "),

    "q52_zonal_stats" ->
      s"""WITH $polysCte, ${graft.ops.Raster.coveredCteSql}
         | SELECT poly_id, count(*) AS n_pixels,
         |  CAST(SUM${graft.ops.Raster.bandValueSql} AS BIGINT) AS zonal_sum,
         |  CAST(MIN${graft.ops.Raster.bandValueSql} AS BIGINT) AS zonal_min,
         |  CAST(MAX${graft.ops.Raster.bandValueSql} AS BIGINT) AS zonal_max
         | FROM covered GROUP BY poly_id""".stripMargin.replace("\n", " "),

    "q18_osm_ways" -> {
      s"""WITH refs AS ${OsmElements.wayRefsSql}, nodes AS ${OsmElements.nodesSql},
         | resolved AS (SELECT r.way_id, count(*) AS npts FROM refs r JOIN nodes n ON r.ref = n.node_id GROUP BY r.way_id),
         | cls AS (SELECT way_id,
         |   max(CASE WHEN i = 0 THEN ref END) AS first_ref,
         |   max(CASE WHEN i = 3 + way_id % 5 THEN ref END) AS last_ref FROM refs GROUP BY way_id)
         | SELECT r.way_id, CASE WHEN c.first_ref = c.last_ref THEN 'Polygon' ELSE 'LineString' END AS kind, r.npts
         | FROM resolved r JOIN cls c USING (way_id)""".stripMargin.replace("\n", " ")
    },

    "q20_dedup_exact" ->
      s"""WITH corpus AS ${Dedup.corpusSql}
         | SELECT md5(text) AS text_hash, CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_copies
         | FROM corpus GROUP BY md5(text)""".stripMargin.replace("\n", " "),

    "q21_minhash_lsh" ->
      s"""WITH $corpusShCte, $minhashPairsCtes
         | SELECT doc_a, doc_b FROM mh_pairs""".stripMargin.replace("\n", " "),

    // connected components over the q21 pair graph: DuckDB side = recursive
    // transitive closure (fine at oracle scale); Spark side = O(log n)
    // large-star/small-star rounds (closure materialization would be
    // quadratic at 100 TB)
    "q36_dedup_components" ->
      s"""WITH RECURSIVE $corpusShCte, $minhashPairsCtes,
         | edges AS (SELECT doc_a AS u, doc_b AS v FROM mh_pairs
         |   UNION SELECT doc_b AS u, doc_a AS v FROM mh_pairs),
         | reach AS (SELECT u, v FROM edges
         |   UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         | SELECT u AS doc_id, CAST(least(u, min(v)) AS BIGINT) AS component
         | FROM reach GROUP BY u""".stripMargin.replace("\n", " "),

    // ExactSubstr duplicated spans: the fold/break rules are generated from
    // the same constants the Spark plan uses (SubstrDedup.dupSpansSql)
    "q107_dup_spans" -> graft.ops.SubstrDedup.dupSpansSql(Dedup.corpusSql),

    "q22_simhash" -> {
      val sums = (0 until Dedup.Planes).map(j =>
        s"sum(CASE WHEN (tid * ${Dedup.PlaneA(j)} + ${Dedup.PlaneB(j)}) % ${Dedup.P} < ${Dedup.HalfP} THEN 1 ELSE -1 END) AS s$j").mkString(", ")
      val bits = (0 until Dedup.Planes).map(j =>
        s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      s"""WITH $corpusToksCte, sigs AS (SELECT doc_id, $sums FROM tt GROUP BY doc_id)
         | SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM sigs""".stripMargin.replace("\n", " ")
    },

    // shingle doc-freq cap mirrors Dedup.MaxShingleFreqDefault (on by
    // default on the Spark side); sizes are computed over the CAPPED
    // shingle set, matching jaccardPairs' post-filter `sizes`
    "q23_jaccard_pairs" ->
      s"""WITH corpus AS ${Dedup.corpusSql},
         | tokarr AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS a FROM corpus),
         | rawsh AS (SELECT DISTINCT doc_id, sh FROM
         |   (SELECT doc_id, array_to_string(a[i+1:i+3], ' ') AS sh FROM
         |     (SELECT doc_id, a, unnest(range(len(a) - 2)) AS i FROM tokarr WHERE len(a) >= 3) x) y),
         | freq AS (SELECT sh, count(*) AS df FROM rawsh GROUP BY sh),
         | sh AS (SELECT r.doc_id, r.sh FROM rawsh r JOIN freq USING (sh)
         |   WHERE freq.df <= ${Dedup.MaxShingleFreqDefault}),
         | sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         | inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |   FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
         | SELECT doc_a, doc_b, inter, sa.nsh AS na, sb.nsh AS nb FROM inter
         | JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         | WHERE inter * 2 >= sa.nsh + sb.nsh - inter""".stripMargin.replace("\n", " "),

    // brute-force containment over the planted-quote corpus; same shingle
    // CTEs and df cap as q23, (size, id) orientation + the two containment
    // filters as the final SELECT
    "q156_containment_pairs" ->
      s"""WITH corpus AS ${Dedup.quoteCorpusSql},
         | tokarr AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS a FROM corpus),
         | rawsh AS (SELECT DISTINCT doc_id, sh FROM
         |   (SELECT doc_id, array_to_string(a[i+1:i+3], ' ') AS sh FROM
         |     (SELECT doc_id, a, unnest(range(len(a) - 2)) AS i FROM tokarr WHERE len(a) >= 3) x) y),
         | freq AS (SELECT sh, count(*) AS df FROM rawsh GROUP BY sh),
         | sh AS (SELECT r.doc_id, r.sh FROM rawsh r JOIN freq USING (sh)
         |   WHERE freq.df <= ${Dedup.MaxShingleFreqDefault}),
         | sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         | inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
         |   FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         | prs AS (SELECT CASE WHEN s1.nsh <= s2.nsh THEN d1 ELSE d2 END AS doc_small,
         |     CASE WHEN s1.nsh <= s2.nsh THEN d2 ELSE d1 END AS doc_big,
         |     inter, least(s1.nsh, s2.nsh) AS na, greatest(s1.nsh, s2.nsh) AS nb
         |   FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2)
         | SELECT doc_small, doc_big, inter, na, nb FROM prs
         | WHERE inter * 5 >= na * 4 AND inter * 2 < na + nb - inter"""
      .stripMargin.replace("\n", " "),

    "q24_text_stats" ->
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS n_distinct,
        | CAST(length(text) AS BIGINT) AS n_chars,
        | CAST(list_max(list_transform(list_filter(string_split(text, ' '), t -> t <> ''), t -> length(t))) AS BIGINT) AS max_tok_len,
        | CAST(len(list_filter(string_split(text, ' '), t -> t = 'the')) AS BIGINT) AS n_the
        | FROM documents""".stripMargin.replace("\n", " "),

    "q25_lang_id" -> {
      def score(ms: Seq[String]) =
        s"CAST(len(list_filter(string_split(text, ' '), t -> ${ms.map(m => s"t = '$m'").mkString(" OR ")})) AS BIGINT)"
      s"""SELECT doc_id, s_en, s_de, s_es,
         | CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en' WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS pred_lang
         | FROM (SELECT doc_id, ${score(TextStats.MarkersEn)} AS s_en, ${score(TextStats.MarkersDe)} AS s_de,
         |   ${score(TextStats.MarkersEs)} AS s_es FROM documents) t""".stripMargin.replace("\n", " ")
    },

    // q33 = blocked equi-join + partial top-k agg; exact, so it is checked
    // against the SAME brute-force oracle as q27
    "q33_ann_topk_blocked" ->
      s"""WITH $quantElsCte,
         | dots AS (SELECT a.vec_id AS query_id, b.vec_id AS nn_id, CAST(sum(a.x * b.x) AS BIGINT) AS dot
         |   FROM els a JOIN els b ON a.i = b.i AND a.vec_id % 20 = 0 AND a.vec_id <> b.vec_id GROUP BY 1, 2)
         | SELECT query_id, rnk AS rank, nn_id, dot FROM (
         |   SELECT query_id, nn_id, dot, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, nn_id) AS rnk
         |   FROM dots) WHERE rnk <= 5""".stripMargin.replace("\n", " "),

    "q27_ann_topk" ->
      s"""WITH $quantElsCte,
         | dots AS (SELECT a.vec_id AS query_id, b.vec_id AS nn_id, CAST(sum(a.x * b.x) AS BIGINT) AS dot
         |   FROM els a JOIN els b ON a.i = b.i AND a.vec_id % 20 = 0 AND a.vec_id <> b.vec_id GROUP BY 1, 2)
         | SELECT query_id, rnk AS rank, nn_id, dot FROM (
         |   SELECT query_id, nn_id, dot, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, nn_id) AS rnk
         |   FROM dots) WHERE rnk <= 5""".stripMargin.replace("\n", " "),

    "q31_media_meta" ->
      s"""WITH pages AS (SELECT url,
         |   '<html><head><title>' || url || '</title></head><body><p>' || pt || '</p></body></html>' AS htmlstr
         |   FROM (SELECT ${W.urlSql} AS url, ${W.pageTextSql} AS pt FROM documents) t)
         | SELECT url, CAST(octet_length(encode(htmlstr)) AS BIGINT) AS n_bytes,
         |   hex(encode(left(htmlstr, 4))) AS magic,
         |   CASE WHEN hex(encode(left(htmlstr, 4))) = '3C68746D' THEN 'html' ELSE 'unknown' END AS kind
         | FROM pages""".stripMargin.replace("\n", " "),

    "q32_media_decode" -> graft.sources.MediaSynth.oracleSql,
    "q45_media_audio" -> graft.sources.MediaSynth.audioOracleSql,
    "q48_video_frames" -> graft.sources.MediaSynth.videoOracleSql,
    "q49_image_pixels" -> graft.sources.MediaSynth.pixelOracleSql,
    "q50_image_resize" -> graft.sources.MediaSynth.thumbOracleSql,
    "q87_image_ahash" -> graft.sources.MediaSynth.ahashOracleSql,
    "q46_domain_salt" -> graft.ops.SkewProfile.domainProfileSql(W.urlSql, cap = 50),
    "q26_fingerprint" -> TextStats.fingerprintsSql,
    "q35_token_count" -> TextStats.bpeTokensSql,
    "q66_repetition" -> TextStats.repetitionStatsSql,
    "q68_html_extract" ->
      s"""SELECT ${sources.WebPagesSynth.urlSql} AS url,
         | ${sources.WebPagesSynth.pageTextSql} AS extracted_text,
         | CAST(1 AS BIGINT) AS matches_text FROM documents""".stripMargin.replace("\n", " "),

    "q67_url_dedup" ->
      s"""SELECT canon_url, CAST(count(*) AS BIGINT) AS n_urls FROM (
         | ${graft.ops.UrlOps.canonicalizePipelineSql(graft.ops.UrlOps.urlVariantsSql)}
         |) GROUP BY 1""".stripMargin.replace("\n", " "),
    "q69_line_dedup" -> graft.ops.CorpusOps.lineDedupSql(),
    "q71_pack_shards" -> graft.ops.CorpusOps.packShardsSql(budget = 2000),
    "q74_pyramid_incremental" ->
      s"""WITH $entsCte
         | ${graft.index.CellPyramid.pyramidSqlOver("ents e", eLon, eLat, finest = 10, depth = 3)}"""
        .stripMargin.replace("\n", " "),
    "q73_group_quantiles" ->
      graft.ops.CorpusOps.groupQuantilesSql("n_chars", "lang", Seq(50, 90, 99)),
    "q72_pyramid_count" ->
      s"""WITH $entsCte, $polysCte
         | SELECT p.poly_id, CAST(count(*) AS BIGINT) AS n_points
         | FROM ents e JOIN polys p ON $pipPred GROUP BY 1""".stripMargin.replace("\n", " "),
    "q70_stratified_sample" -> graft.ops.CorpusOps.stratifiedSampleSql(n = 20),
    "q37_langid_ngram" -> TextStats.langIdNgramSql,
    "q38_contamination" -> TextStats.contaminationSql(),
    "q39_pii_redact" -> TextStats.redactPiiSql,

    // q57: the pruned read must return EXACTLY the bbox rows — the oracle
    // replays only the exact filter over the same closed-form node layer,
    // so any bucket/row-group skipped wrongly shows up as a missing row
    "q57_pruned_bbox" ->
      s"""SELECT node_id FROM ${graft.sources.OsmElements.nodesSql} n
         | WHERE lon >= 10.0 AND lon < 30.0 AND lat >= 5.0 AND lat < 25.0""".stripMargin.replace("\n", " "),
    "q47_quality_filter" -> TextStats.qualityFilterSql(),
    "q40_geojson_scan" -> graft.sources.FileFixtures.geojsonOracle,
    "q41_shapefile_scan" -> graft.sources.FileFixtures.shapefileOracle,
    "q43_shapefile_dsv2" -> graft.sources.FileFixtures.shapefileOracle,
    "q75_geojsonl_dsv2" -> graft.sources.FileFixtures.geojsonlOracle,
    "q92_geojsonl_roundtrip" -> graft.sources.FileFixtures.geojsonlOracle,
    "q78_geojson_dsv2" -> graft.sources.FileFixtures.geojsonOracle,
    "q79_pbf_dsv2" -> graft.sources.FileFixtures.pbfOracle,
    "q42_pbf_scan" -> graft.sources.FileFixtures.pbfOracle,
    "q60_pbf_relations" -> graft.sources.FileFixtures.pbfRelOracle,

    // multiprobe LSH top-k, fully replicated: same planes, same 79 probe
    // masks (shared Scala constant), same integer rerank, same (dot DESC,
    // nn_id) tie-break as TopKByScore — deterministic end to end, so the
    // "approximate" path is hash-checked, not merely rows-only
    "q34_ann_topk_lsh" -> {
      val masks = Ann.probeMasks(2).mkString(", ")
      s"""WITH $quantElsCte,
         | proj AS (SELECT e.vec_id, p.j, CAST(sum(e.x * ((e.i * (p.j + 3)) % 3 - 1)) AS BIGINT) AS pr
         |   FROM els e CROSS JOIN (SELECT unnest(range(${Ann.NumPlanes})) AS j) p GROUP BY 1, 2),
         | buckets AS (SELECT vec_id, CAST(sum(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS bucket
         |   FROM proj GROUP BY vec_id),
         | masks AS (SELECT unnest([$masks]) AS mask),
         | probes AS (SELECT b.vec_id AS query_id, xor(b.bucket, CAST(m.mask AS BIGINT)) AS pbucket
         |   FROM buckets b CROSS JOIN masks m WHERE b.vec_id % 20 = 0),
         | cand AS (SELECT p.query_id, c.vec_id AS nn_id FROM probes p
         |   JOIN buckets c ON c.bucket = p.pbucket AND c.vec_id <> p.query_id),
         | pdot AS (SELECT cd.query_id, cd.nn_id, CAST(sum(ea.x * eb.x) AS BIGINT) AS dot FROM cand cd
         |   JOIN els ea ON ea.vec_id = cd.query_id JOIN els eb ON eb.vec_id = cd.nn_id AND eb.i = ea.i GROUP BY 1, 2)
         | SELECT query_id, rnk AS rank, nn_id, dot FROM (
         |   SELECT query_id, nn_id, dot, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, nn_id) AS rnk
         |   FROM pdot) WHERE rnk <= 5""".stripMargin.replace("\n", " ")
    },

    // q29/q44 (formerly the rows-only ANN paths): over the planted-
    // neighborhood corpus (Ann.plantedCorpus, copies = 5) each query's
    // exact top-5 is its 5 identical copies — equal scores, nn_id
    // tie-break — so the ranking is this closed form. q44 additionally
    // carries the integer dot, recomputable as the quantized self-dot.
    "q29_cosine_topk" ->
      """SELECT vec_id AS query_id, CAST(j AS BIGINT) AS rank,
        | vec_id + 1000000 + j AS nn_id
        | FROM embeddings, (SELECT unnest(range(1, 6)) AS j) jj
        | WHERE vec_id % 20 = 0""".stripMargin.replace("\n", " "),

    "q44_ann_topk_ivf" ->
      s"""WITH quant AS (SELECT vec_id, ${Ann.quantSqlExpr} AS q FROM embeddings),
         | sd AS (SELECT vec_id,
         |   CAST(list_aggregate(list_transform(q, x -> x * x), 'sum') AS BIGINT) AS dot
         |   FROM quant)
         | SELECT vec_id AS query_id, CAST(j AS BIGINT) AS rank,
         |   vec_id + 1000000 + j AS nn_id, dot
         | FROM sd, (SELECT unnest(range(1, 6)) AS j) jj
         | WHERE vec_id % 20 = 0""".stripMargin.replace("\n", " "),

    // q30: LSH candidates verified by exact text equality == the planted
    // mirror set (identical text => identical signature => same bucket in
    // every band; originals are pairwise-unique so nothing else verifies)
    "q30_minhash_prod" ->
      """SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
        | FROM documents WHERE doc_id % 3 = 0""".stripMargin.replace("\n", " "),

    // IVF recall contract: every planted mirror's rank-1 neighbor must be
    // its original (identical vector => same nearest cell => always found;
    // dot(q, orig) = |q|^2 beats every non-parallel candidate by
    // Cauchy-Schwarz). The oracle is the contract itself: one row per
    // mirror query with rank1_is_mirror = 1.
    "q58_ivf_recall" ->
      """SELECT vec_id + 1000000 AS query_id, CAST(1 AS BIGINT) AS rank1_is_mirror
        | FROM embeddings WHERE vec_id % 40 = 0""".stripMargin.replace("\n", " "),

    // same planted-mirror contract through the float-cosine path (q62) —
    // identical query-side predicate, so the oracle is the same table
    "q62_cosine_recall" ->
      """SELECT vec_id + 1000000 AS query_id, CAST(1 AS BIGINT) AS rank1_is_mirror
        | FROM embeddings WHERE vec_id % 40 = 0""".stripMargin.replace("\n", " "),

    // quantified recall@5 floors (q76/q77): the Spark side computes
    // per-query recall of the approximate path against the exact blocked
    // top-k and emits the floor indicator; the oracle asserts the floor
    // holds for EVERY query in the real query set (vec_id % 20 = 0 — the
    // same set the exact side ranks). Floor constants are generated from
    // SparkEntry so both sides move together.
    "q76_ivf_recall_at_k" ->
      s"""SELECT vec_id AS query_id, CAST(1 AS BIGINT)
        | AS recall_ge_${graft.SparkEntry.IvfRecallFloorPct}
        | FROM embeddings WHERE vec_id % 20 = 0""".stripMargin.replace("\n", " "),
    "q77_cosine_recall_at_k" ->
      s"""SELECT vec_id AS query_id, CAST(1 AS BIGINT)
        | AS recall_ge_${graft.SparkEntry.CosineRecallFloorPct}
        | FROM embeddings WHERE vec_id % 20 = 0""".stripMargin.replace("\n", " "),

    // tile-content clipping. q64: every polygon's per-cell pieces must sum
    // to its closed-form doubled area in x80 units (diamond area 2r^2 =>
    // 2*area*80^2 = 25600*r^2, an exact integer on this lattice); n_cells
    // and q65's (poly, cell) set re-derive from the L1 diamond-rect
    // intersection test dist_L1(center, cell) < r. True lattice values of
    // |dist - r| are either 0 (zero-area touch, excluded on both sides) or
    // >= 0.0125, so the float predicate uses the half-gap margin 0.005 to
    // classify exactly. Level 6 cells: 5.625 x 2.8125 degrees.
    "q64_tile_clip" ->
      s"""WITH p AS (SELECT p_partkey AS poly_id, ${sources.Layers.polyCxSql} AS cx,
         |   ${sources.Layers.polyCySql} AS cy, ${sources.Layers.polyRSql} AS r FROM part),
         | c AS (SELECT poly_id, r FROM p,
         |   (SELECT unnest(range(64)) AS ix) x, (SELECT unnest(range(64)) AS iy) y
         |  WHERE greatest(0, ix*5.625 - 180 - cx, cx - (ix*5.625 - 180 + 5.625))
         |      + greatest(0, iy*2.8125 - 90 - cy, cy - (iy*2.8125 - 90 + 2.8125)) < r - 0.005)
         | SELECT poly_id, CAST(count(*) AS BIGINT) AS n_cells,
         |   CAST(round(25600 * max(r) * max(r)) AS BIGINT) AS area2x
         | FROM c GROUP BY poly_id""".stripMargin.replace("\n", " "),

    "q65_tile_cells" ->
      s"""WITH p AS (SELECT p_partkey AS poly_id, ${sources.Layers.polyCxSql} AS cx,
         |   ${sources.Layers.polyCySql} AS cy, ${sources.Layers.polyRSql} AS r FROM part)
         | SELECT poly_id, CAST(ix AS BIGINT) AS cell_x, CAST(iy AS BIGINT) AS cell_y FROM p,
         |   (SELECT unnest(range(64)) AS ix) x, (SELECT unnest(range(64)) AS iy) y
         |  WHERE greatest(0, ix*5.625 - 180 - cx, cx - (ix*5.625 - 180 + 5.625))
         |      + greatest(0, iy*2.8125 - 90 - cy, cy - (iy*2.8125 - 90 + 2.8125)) < r - 0.005""".stripMargin.replace("\n", " "),

    // prod-MinHash exact-duplicate containment: every planted mirror pair
    // must be found by the capped xxhash64 path (identical signatures share
    // every band bucket; the heavy-hitter cap only drops degenerate buckets)
    "q63_minhash_prod_recall" ->
      """SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b, CAST(1 AS BIGINT) AS found
        | FROM documents WHERE doc_id % 3 = 0""".stripMargin.replace("\n", " "),

    // q28's pair pipeline -> recursive transitive closure (oracle-scale
    // CC, mirroring q36's pattern) -> left join back onto the full corpus
    // so singletons appear with cluster = self, keep = 1
    "q102_emb_dedup_clusters" ->
      s"""WITH RECURSIVE $quantElsCorpusCte,
         | proj AS (SELECT e.vec_id, p.j, CAST(sum(e.x * ((e.i * (p.j + 3)) % 3 - 1)) AS BIGINT) AS pr
         |   FROM els e CROSS JOIN (SELECT unnest(range(${Ann.NumPlanes})) AS j) p GROUP BY 1, 2),
         | buckets AS (SELECT vec_id, CAST(sum(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS bucket
         |   FROM proj GROUP BY vec_id),
         | norms AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS nrm FROM els GROUP BY vec_id),
         | cpairs AS (SELECT a.vec_id AS va, b.vec_id AS vb FROM buckets a
         |   JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         | pdot AS (SELECT p.va, p.vb, CAST(sum(ea.x * eb.x) AS BIGINT) AS dot FROM cpairs p
         |   JOIN els ea ON ea.vec_id = p.va JOIN els eb ON eb.vec_id = p.vb AND eb.i = ea.i GROUP BY 1, 2),
         | nd AS (SELECT va, vb FROM pdot
         |   JOIN norms na ON na.vec_id = va JOIN norms nb ON nb.vec_id = vb
         |   WHERE dot > 0 AND dot * dot * 4 >= na.nrm * nb.nrm),
         | edges AS (SELECT va AS u, vb AS v FROM nd UNION SELECT vb AS u, va AS v FROM nd),
         | reach AS (SELECT u, v FROM edges
         |   UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         | comp AS (SELECT u AS vec_id, least(u, min(v)) AS cluster FROM reach GROUP BY u)
         | SELECT c.vec_id, CAST(coalesce(m.cluster, c.vec_id) AS BIGINT) AS cluster,
         |   CAST(CASE WHEN coalesce(m.cluster, c.vec_id) = c.vec_id THEN 1 ELSE 0 END AS BIGINT) AS keep
         | FROM ecorpus c LEFT JOIN comp m ON m.vec_id = c.vec_id""".stripMargin.replace("\n", " "),

    "q28_lsh_neardup" ->
      s"""WITH $quantElsCorpusCte,
         | proj AS (SELECT e.vec_id, p.j, CAST(sum(e.x * ((e.i * (p.j + 3)) % 3 - 1)) AS BIGINT) AS pr
         |   FROM els e CROSS JOIN (SELECT unnest(range(${Ann.NumPlanes})) AS j) p GROUP BY 1, 2),
         | buckets AS (SELECT vec_id, CAST(sum(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS bucket
         |   FROM proj GROUP BY vec_id),
         | norms AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS nrm FROM els GROUP BY vec_id),
         | pairs AS (SELECT a.vec_id AS va, b.vec_id AS vb FROM buckets a
         |   JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         | pdot AS (SELECT p.va, p.vb, CAST(sum(ea.x * eb.x) AS BIGINT) AS dot FROM pairs p
         |   JOIN els ea ON ea.vec_id = p.va JOIN els eb ON eb.vec_id = p.vb AND eb.i = ea.i GROUP BY 1, 2)
         | SELECT va AS vec_a, vb AS vec_b, dot FROM pdot
         | JOIN norms na ON na.vec_id = va JOIN norms nb ON nb.vec_id = vb
         | WHERE dot > 0 AND dot * dot * 4 >= na.nrm * nb.nrm""".stripMargin.replace("\n", " ")
  )
}
