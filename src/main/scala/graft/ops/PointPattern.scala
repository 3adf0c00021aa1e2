package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-pattern analysis over exact lattice coordinates — the two
  * statistics a geo-extraction atlas runs after the ESDA lattice family
  * ([[SpatialStats]]): exact point-pair DBSCAN (PostGIS `ST_ClusterDBSCAN`,
  * which popgis users run immediately after loading; reference scope is
  * load-only, `src/main.rs`) and Ripley's K pair counts (the
  * point-pattern clustering function; PySAL/spatstat compute it
  * single-node).
  *
  * Both run on the synthetic entities' exact integer lattice coordinates
  * (`lonm` in [0,7200), `latm` in [0,2800) — 1/20-degree units), so every
  * distance compare is exact BIGINT arithmetic (`dx*dx + dy*dy <= eps*eps`)
  * and the oracle hash-checks with zero float involvement.
  *
  * Scale shape (the part that survives 100 TB):
  *   1. points collapse to DISTINCT coords with multiplicity — ONE
  *      map-side-combinable exchange over the fact table; a billion
  *      co-located mentions become one row with m = 1e9, so the pairwise
  *      stage's input is bounded by the coordinate lattice, not the corpus;
  *   2. eps-pairs by block-grid equi-join: block side = eps, each coord
  *      emits its 3x3 block neighborhood (constant explode), equi-join on
  *      the block key — any pair within eps differs by <= 1 block per
  *      axis, so candidates are complete, each DIRECTED pair is produced
  *      exactly once (the right side sits in its own block — no dedup
  *      pass), and the join is a hash join, never a theta join;
  *   3. DBSCAN core test is a groupBy-sum of neighbor multiplicities
  *      (counting the point itself, per the standard definition);
  *      core-core edges feed [[Dedup.components]]' large/small-star CC —
  *      O(log^2 n) rounds, each one exchange;
  *   4. border coords take the MINIMUM core-neighbor label (DBSCAN's only
  *      nondeterminism, pinned for reproducibility + oracle hashing);
  *      labels flow back to points by one equi-join on the coord key.
  */
object PointPattern {

  /** q122 parameters: eps 2 lattice units (0.1 deg), core threshold 5
    * points. The planted urban block (WebPagesSynth lonm 4000..4019,
    * latm 1400..1419) is one dense 20x20 component; background coords
    * (multiplicity ~3 from the modular synth cycle) form occasional small
    * cores and noise, so all three label paths (core / border / noise)
    * are exercised by the driver query itself. */
  val DbscanEps = 2L
  val DbscanMinPts = 5L

  /** q123 radii (lattice units). Monotone pair counts across radii give
    * the K-function's shape; the consumer divides by area * n^2 once. */
  val RipleyRadii = Seq(1L, 2L, 4L, 8L)

  /** Injective coord key: latm < 2800 << 10000. */
  val KeyMul = 10000L

  /** Distinct lattice coords with multiplicity `m` — the one fact-table
    * exchange (map-side combined). */
  private def coords(pts: DataFrame): DataFrame =
    pts.groupBy("lonm", "latm").agg(count(lit(1)).as("m"))

  /** All DIRECTED coord pairs within `eps` (including a==b, d2=0):
    * (ax, ay, ma, cx, cy, mc, d2). Block side = eps; 3x3 neighborhood. */
  private def epsPairs(cs: DataFrame, eps: Long): DataFrame =
    epsPairsLR(cs, cs, eps)

  /** Blocked pair join between two coord sets (lonm, latm, m): every
    * (a in `ls`, c in `rs`) pair with d2 <= eps^2, each exactly once. */
  private def epsPairsLR(ls: DataFrame, rs: DataFrame, eps: Long): DataFrame = {
    require(eps >= 1, s"eps must be >= 1 lattice unit: $eps")
    val offs = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val left = ls
      .select(col("lonm").as("ax"), col("latm").as("ay"), col("m").as("ma"),
        explode(array(offs: _*)).as("o"),
        expr(s"lonm div ${eps}L").as("bx0"), expr(s"latm div ${eps}L").as("by0"))
      .select(col("ax"), col("ay"), col("ma"),
        (col("bx0") + col("o.dx")).as("bx"), (col("by0") + col("o.dy")).as("by"))
    val right = rs.select(col("lonm").as("cx"), col("latm").as("cy"), col("m").as("mc"),
      expr(s"lonm div ${eps}L").as("bx"), expr(s"latm div ${eps}L").as("by"))
    val d2 = (col("ax") - col("cx")) * (col("ax") - col("cx")) +
      (col("ay") - col("cy")) * (col("ay") - col("cy"))
    left.join(right, Seq("bx", "by"))
      .filter(d2 <= lit(eps * eps))
      .select(col("ax"), col("ay"), col("ma"), col("cx"), col("cy"), col("mc"),
        d2.as("d2"))
  }

  /** Exact point-pair DBSCAN. `pts` must expose url, ent_idx, lonm, latm;
    * output (url, ent_idx, cluster) with cluster = the component's minimum
    * coord key, -1 = noise. */
  def dbscan(pts: DataFrame, eps: Long = DbscanEps,
             minPts: Long = DbscanMinPts): DataFrame = {
    val cs = coords(pts)
    val prs = epsPairs(cs, eps)
      .withColumn("ka", col("ax") * KeyMul + col("ay"))
      .withColumn("kc", col("cx") * KeyMul + col("cy"))
      .localCheckpoint(false) // reused by the core test, core edges, and borders
    // |N_eps(a)| including a itself (the a==a pair carries ma)
    val nbr = prs.groupBy("ka").agg(sum("mc").as("nm"))
    val core = nbr.filter(col("nm") >= minPts).select(col("ka").as("k"))
      .localCheckpoint(false)
    val coreEdges = prs
      .join(core.withColumnRenamed("k", "ka"), Seq("ka"), "left_semi")
      .join(core.withColumnRenamed("k", "kc"), Seq("kc"), "left_semi")
      .filter(col("ka") < col("kc"))
      .select(col("ka").as("doc_a"), col("kc").as("doc_b"))
    val comp = Dedup.components(coreEdges)
      .select(col("doc_id").as("k"), col("component"))
    // isolated core coords (no core within eps besides themselves) label
    // themselves
    val coreLbl = core.join(comp, Seq("k"), "left")
      .select(col("k"), coalesce(col("component"), col("k")).as("lbl"))
      .localCheckpoint(false)
    // border: non-core coord with >= 1 core neighbor takes the MIN core
    // label (deterministic tie-break of DBSCAN's assignment ambiguity)
    val border = prs
      .join(core.withColumnRenamed("k", "ka"), Seq("ka"), "left_anti")
      .join(coreLbl.withColumnRenamed("k", "kc"), Seq("kc"))
      .groupBy("ka").agg(min("lbl").as("lbl"))
      .select(col("ka").as("k"), col("lbl"))
    val labels = coreLbl.unionAll(border)
    pts.withColumn("k", col("lonm") * KeyMul + col("latm"))
      .join(labels, Seq("k"), "left")
      .select(col("url"), col("ent_idx").cast("long").as("ent_idx"),
        coalesce(col("lbl"), lit(-1L)).as("cluster"))
  }

  /** Ripley's K numerators: for each radius r, the exact count of ordered
    * pairs of DISTINCT POINTS (i != j) within L2 distance r — coord pairs
    * weighted ma*mc, minus the T self-pairs the a==c rows overcount.
    * Output (r, pairs), both BIGINT; K(r) = area/T^2 * pairs. */
  def ripleyPairs(pts: DataFrame, radii: Seq[Long] = RipleyRadii): DataFrame = {
    require(radii.nonEmpty && radii.forall(_ >= 1))
    val rmax = radii.max
    val cs = coords(pts)
    val prs = epsPairs(cs, rmax)
    val t = pts.agg(count(lit(1)).as("t"))
    val perR = radii.map { r =>
      sum(when(col("d2") <= r * r, col("ma") * col("mc")).otherwise(0L))
        .as(s"s$r")
    }
    val sums = prs.agg(perR.head, perR.tail: _*)
    val wide = Scalars.join(sums, t)
    // one row per radius, exact
    val rows = radii.map { r =>
      wide.select(lit(r).as("r"), (col(s"s$r") - col("t")).as("pairs"))
    }
    rows.reduce(_ unionAll _)
  }

  /** q127 radii (lattice units). */
  val CrossKRadii = Seq(2L, 8L)

  /** Bivariate (cross-type) Ripley's K numerators — co-location mining:
    * for each radius, the exact count of ordered (A-point, B-point) pairs
    * within distance r, where A = rows with `clsCol` == `aVal` and B = the
    * rest. Classes are disjoint, so there is no self-pair correction.
    * Output (r, pairs), BIGINT; K_AB(r) = area/(n_A n_B) * pairs.
    *
    * Scale shape: two class-filtered coord collapses (each map-side
    * combined), ONE blocked pair join at r_max, per-radius conditional
    * sums — same cost structure as [[ripleyPairs]]. */
  def crossK(pts: DataFrame, clsCol: String, aVal: String,
             radii: Seq[Long] = CrossKRadii): DataFrame = {
    require(radii.nonEmpty && radii.forall(_ >= 1))
    val a = coords(pts.filter(col(clsCol) === aVal).select("lonm", "latm"))
    val b = coords(pts.filter(col(clsCol) =!= aVal).select("lonm", "latm"))
    val prs = epsPairsLR(a, b, radii.max)
    val perR = radii.map { r =>
      sum(when(col("d2") <= r * r, col("ma") * col("mc")).otherwise(0L))
        .as(s"s$r")
    }
    val sums = prs.agg(perR.head, perR.tail: _*)
    radii.map { r =>
      sums.select(lit(r).as("r"), coalesce(col(s"s$r"), lit(0L)).as("pairs"))
    }.reduce(_ unionAll _)
  }

  /** Exact 1-NN self-distance per point (the Clark-Evans nearest-neighbor
    * primitive): squared L2 lattice distance to the nearest OTHER point —
    * 0 for any point sharing its exact coord with another (multiplicity
    * >= 2), -1 only if the dataset holds a single distinct coord.
    *
    * Scale shape: co-located points resolve instantly from the coord
    * collapse (no pairs at all — at web scale that is most of the mass);
    * the rest resolve by RADIUS-GROWING blocked joins: each round joins
    * the still-unresolved coords (left) against all coords (right) at
    * radius 16*32^k — complete within the radius, so the min is the true
    * NN once any pair is found. <= 3 rounds reach the world diagonal
    * regardless of data; each round's left side shrinks to the points
    * whose NN is farther than the previous radius (isolated stragglers).
    * The per-round `isEmpty` driver check is bounded by those 3 rounds —
    * same discipline as the BFS/CC round loops. */
  def nnDistance(pts: DataFrame): DataFrame = {
    val cs = coords(pts).localCheckpoint(false)
    var resolved = cs.filter(col("m") >= 2)
      .select(col("lonm"), col("latm"), lit(0L).as("nnd2"))
    var unresolved = cs.filter(col("m") === 1)
      .select("lonm", "latm", "m").localCheckpoint(false)
    var r = 16L
    // world span is 7200 x 2800 lattice units -> diagonal < 7727; x32
    // growth caps the loop at 3 rounds (16, 512, 16384) — each round is
    // ~3 sequential Spark jobs of fixed latency, so round count is the
    // dominant small-data cost. Candidate density stays bounded: the
    // left side is only coords whose NN exceeded the previous radius,
    // and a packing argument caps coords with pairwise distance > r_prev
    // at (r/r_prev)^2 per block (~1k at x32), while dense areas resolve
    // at the multiplicity stage or in the first round
    while (r <= 16384L && !unresolved.isEmpty) {
      val found = epsPairsLR(unresolved, cs, r)
        .filter(col("ax") =!= col("cx") || col("ay") =!= col("cy"))
        .groupBy("ax", "ay").agg(min("d2").as("nnd2"))
        .select(col("ax").as("lonm"), col("ay").as("latm"), col("nnd2"))
        .localCheckpoint(false)
      resolved = resolved.unionAll(found)
      unresolved = unresolved.join(found, Seq("lonm", "latm"), "left_anti")
        .localCheckpoint(false)
      r *= 32
    }
    pts.join(resolved, Seq("lonm", "latm"), "left")
      .select(col("url"), col("ent_idx").cast("long").as("ent_idx"),
        coalesce(col("nnd2"), lit(-1L)).as("nnd2"))
  }

  // ---- DuckDB replicas (identical integer op sequence) ----

  /** DuckDB replica of [[nnDistance]]: quadratic coord self-join is fine
    * at oracle scale. */
  def nnDistanceSql(entsCte: String): String =
    s"""WITH $entsCte,
       | cs AS (SELECT lonm, latm, count(*) AS m FROM ents e GROUP BY 1, 2),
       | mind AS (SELECT a.lonm, a.latm,
       |     min((a.lonm - b.lonm) * (a.lonm - b.lonm)
       |       + (a.latm - b.latm) * (a.latm - b.latm)) AS d2
       |   FROM cs a JOIN cs b ON NOT (a.lonm = b.lonm AND a.latm = b.latm)
       |   GROUP BY 1, 2),
       | nn AS (SELECT c.lonm, c.latm,
       |     CASE WHEN c.m >= 2 THEN 0 ELSE coalesce(d.d2, -1) END AS nnd2
       |   FROM cs c LEFT JOIN mind d ON d.lonm = c.lonm AND d.latm = c.latm)
       | SELECT e.url, CAST(e.ent_idx AS BIGINT) AS ent_idx,
       |   CAST(n.nnd2 AS BIGINT) AS nnd2
       | FROM ents e JOIN nn n ON n.lonm = e.lonm AND n.latm = e.latm"""
      .stripMargin.replace("\n", " ")

  /** Shared pair CTEs over `ents e` (lonm/latm columns): distinct coords
    * with multiplicity, block keys at `block`, directed pairs within
    * `eps` (including a==c). */
  private def pairCtes(entsCte: String, eps: Long): String =
    s"""WITH RECURSIVE $entsCte,
       | cs AS (SELECT lonm, latm, count(*) AS m FROM ents e GROUP BY 1, 2),
       | ck AS (SELECT lonm, latm, m, lonm // $eps AS bx, latm // $eps AS by FROM cs),
       | offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1))
       |   AS o(dx, dy)),
       | prs AS (SELECT a.lonm AS ax, a.latm AS ay, a.m AS ma,
       |     b.lonm AS cx, b.latm AS cy, b.m AS mc,
       |     (a.lonm - b.lonm) * (a.lonm - b.lonm)
       |       + (a.latm - b.latm) * (a.latm - b.latm) AS d2
       |   FROM ck a CROSS JOIN offs o
       |   JOIN ck b ON b.bx = a.bx + o.dx AND b.by = a.by + o.dy
       |   WHERE (a.lonm - b.lonm) * (a.lonm - b.lonm)
       |       + (a.latm - b.latm) * (a.latm - b.latm) <= ${eps * eps})"""
      .stripMargin.replace("\n", " ")

  /** DuckDB replica of [[dbscan]]. */
  def dbscanSql(entsCte: String, eps: Long = DbscanEps,
                minPts: Long = DbscanMinPts): String =
    s"""${pairCtes(entsCte, eps)},
       | kp AS (SELECT ax * $KeyMul + ay AS ka, cx * $KeyMul + cy AS kc, mc FROM prs),
       | core AS (SELECT ka AS k FROM kp GROUP BY ka HAVING sum(mc) >= $minPts),
       | cedges AS (SELECT p.ka AS u, p.kc AS v FROM kp p
       |   JOIN core a ON a.k = p.ka JOIN core c ON c.k = p.kc WHERE p.ka <> p.kc),
       | creach AS (SELECT u, v FROM cedges
       |   UNION SELECT r.u, e.v FROM creach r JOIN cedges e ON r.v = e.u),
       | ccomp AS (SELECT u AS k, least(u, min(v)) AS lbl FROM creach GROUP BY u),
       | corelbl AS (SELECT c.k, coalesce(cc.lbl, c.k) AS lbl
       |   FROM core c LEFT JOIN ccomp cc USING (k)),
       | border AS (SELECT p.ka AS k, min(l.lbl) AS lbl FROM kp p
       |   JOIN corelbl l ON l.k = p.kc
       |   WHERE p.ka NOT IN (SELECT k FROM core) GROUP BY p.ka),
       | labels AS (SELECT * FROM corelbl UNION ALL SELECT * FROM border)
       | SELECT e.url, CAST(e.ent_idx AS BIGINT) AS ent_idx,
       |   CAST(coalesce(l.lbl, -1) AS BIGINT) AS cluster
       | FROM ents e LEFT JOIN labels l ON l.k = e.lonm * $KeyMul + e.latm"""
      .stripMargin.replace("\n", " ")

  /** DuckDB replica of [[crossK]] (`clsExpr` references alias `e`). */
  def crossKSql(entsCte: String, clsExpr: String, aVal: String,
                radii: Seq[Long] = CrossKRadii): String = {
    val rmax = radii.max
    val arms = radii.map { r =>
      s"SELECT $r AS r, CAST(coalesce((SELECT sum(ma * mc) FROM prs WHERE d2 <= ${r * r}), 0) AS BIGINT) AS pairs"
    }.mkString(" UNION ALL ")
    s"""WITH $entsCte,
       | ca AS (SELECT lonm, latm, count(*) AS m, lonm // $rmax AS bx,
       |   latm // $rmax AS by FROM ents e WHERE $clsExpr = '$aVal' GROUP BY 1, 2),
       | cb AS (SELECT lonm, latm, count(*) AS m, lonm // $rmax AS bx,
       |   latm // $rmax AS by FROM ents e WHERE $clsExpr <> '$aVal' GROUP BY 1, 2),
       | offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1))
       |   AS o(dx, dy)),
       | prs AS (SELECT a.m AS ma, b.m AS mc,
       |     (a.lonm - b.lonm) * (a.lonm - b.lonm)
       |       + (a.latm - b.latm) * (a.latm - b.latm) AS d2
       |   FROM ca a CROSS JOIN offs o
       |   JOIN cb b ON b.bx = a.bx + o.dx AND b.by = a.by + o.dy
       |   WHERE (a.lonm - b.lonm) * (a.lonm - b.lonm)
       |       + (a.latm - b.latm) * (a.latm - b.latm) <= ${rmax * rmax})
       | $arms"""
      .stripMargin.replace("\n", " ")
  }

  /** DuckDB replica of [[ripleyPairs]]. */
  def ripleySql(entsCte: String, radii: Seq[Long] = RipleyRadii): String = {
    val rmax = radii.max
    val arms = radii.map { r =>
      s"SELECT $r AS r, CAST((SELECT sum(ma * mc) FROM prs WHERE d2 <= ${r * r}) - t.t AS BIGINT) AS pairs FROM tot t"
    }.mkString(" UNION ALL ")
    s"""${pairCtes(entsCte, rmax)},
       | tot AS (SELECT count(*) AS t FROM ents e)
       | $arms"""
      .stripMargin.replace("\n", " ")
  }
}
