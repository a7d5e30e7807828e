package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Proximity operators (round 9, batch 3): link prediction on the
  * co-occurrence graph and grid-bucketed spatial radius joins — the two
  * "find things near this thing" shapes (graph-near and space-near)
  * that complement the embedding-near ANN family. Both are built on
  * the same scale discipline as q19/q45: never all-pairs — candidates
  * come from a bounded bucket structure (shared middle node / shared
  * grid cell), exact scoring only inside buckets.
  */
object Proximity {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Per-source degree cap for the co-occurrence edge build — the q102
    * KnnK device: keeps every downstream neighborhood bounded.
    */
  private val LinkK = 3

  /** q191: Adamic–Adar link prediction (Adamic & Adar 2003, "Friends
    * and neighbors on the Web") over the q102 supplier co-occurrence
    * graph: for every NON-adjacent pair (x, z) sharing at least one
    * neighbor y, score = Σ_y 1/ln(deg(y)) — common neighbors weighted
    * by how selective they are. The canonical "who should be
    * connected" primitive (recommendations, record-linkage candidate
    * ranking). Mechanics: top-[[LinkK]]-per-node co-order edges (the
    * q102 build), neighbor lists unioned both directions, candidate
    * pairs enumerated PER MIDDLE NODE (each y contributes ≤ K·(K+1)/2
    * pairs — degree-bounded, never all-pairs), existing edges removed
    * by anti-join, 1/ln rounded to 12 and summed as DECIMAL (the q82
    * device), final score rounded to 6 before ordering. At 100 TB the
    * per-y pair fan-out is the only superlinear term and the degree
    * cap bounds it by construction.
    */
  def q191AdamicAdar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "lineitem")
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk")).distinct()
    val pairs = base.as("a").join(base.as("b"), Seq("ok"))
      .filter($"a.sk" =!= $"b.sk")
      .select($"a.sk".as("src"), $"b.sk".as("dst"))
    val support = pairs.groupBy($"src", $"dst").agg(count(lit(1)).as("support"))
    val wK = Window.partitionBy($"src").orderBy($"support".desc, $"dst".asc)
    val edges = support.withColumn("rn", row_number().over(wK))
      .filter($"rn" <= LinkK)
      .select(least($"src", $"dst").as("sa"), greatest($"src", $"dst").as("sb"))
      .distinct().persist()
    // symmetric adjacency + degree of every node
    val adj = edges.select($"sa".as("y"), $"sb".as("n"))
      .union(edges.select($"sb".as("y"), $"sa".as("n")))
    val deg = adj.groupBy($"y").agg(count(lit(1)).as("deg"))
    // candidate pairs through each middle node y (x < z), minus edges
    val cand = adj.as("l").join(adj.as("r"), Seq("y"))
      .filter($"l.n" < $"r.n")
      .select($"y", $"l.n".as("x"), $"r.n".as("z"))
      .join(edges, $"x" === $"sa" && $"z" === $"sb", "left_anti")
    val out = cand.join(deg, Seq("y"))
      .groupBy($"x", $"z")
      .agg(count(lit(1)).as("common"),
        sum(round(lit(1.0) / log($"deg".cast("double")), 12)
          .cast("decimal(20,12)")).as("aa"))
      .select($"x", $"z", $"common", round($"aa".cast("double"), 6).as("score"))
      .orderBy($"score".desc, $"x", $"z")
    edges.unpersist(false)
    out
  }

  private val q191Sql =
    s"""WITH base AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
      |pairs AS (
      |  SELECT a.sk AS src, b.sk AS dst, count(*) AS support
      |  FROM base a JOIN base b USING (ok) WHERE a.sk <> b.sk
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT src, dst, row_number() OVER (PARTITION BY src
      |    ORDER BY support DESC, dst ASC) AS rn
      |  FROM pairs),
      |edges AS (
      |  SELECT DISTINCT least(src, dst) AS sa, greatest(src, dst) AS sb
      |  FROM ranked WHERE rn <= $LinkK),
      |adj AS (
      |  SELECT sa AS y, sb AS n FROM edges
      |  UNION ALL SELECT sb AS y, sa AS n FROM edges),
      |deg AS (SELECT y, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY y),
      |cand AS (
      |  SELECT l.y, l.n AS x, r.n AS z
      |  FROM adj l JOIN adj r USING (y) WHERE l.n < r.n),
      |nonedge AS (
      |  SELECT c.* FROM cand c
      |  WHERE NOT EXISTS (SELECT 1 FROM edges e
      |                    WHERE e.sa = c.x AND e.sb = c.z))
      |SELECT x, z, CAST(count(*) AS BIGINT) AS common,
      |  round(CAST(sum(CAST(round(1.0 / ln(CAST(deg AS DOUBLE)), 12)
      |    AS DECIMAL(20,12))) AS DOUBLE), 6) AS score
      |FROM nonedge JOIN deg USING (y)
      |GROUP BY x, z
      |ORDER BY score DESC, x, z""".stripMargin

  /** Spatial-join geometry: planar coordinates in [0, [[GeoSide]])²
    * synthesized per entity from md5 uniforms (the q151/q162 idiom —
    * the sandbox tables carry no geography, and the derivation doubles
    * as the deterministic-fixture device q185 uses), radius
    * [[GeoRadius]], grid cell size = radius so a query circle can only
    * touch the 3×3 cell neighborhood.
    */
  private val GeoSide = 1000.0
  private val GeoRadius = 50.0

  /** q192: grid-bucketed spatial radius join — every (supplier center,
    * customer point) pair within [[GeoRadius]]: the store-catchment /
    * geofence-assignment shape. The standard grid decomposition
    * (cell = ⌊coord/R⌋): points key by their OWN cell, centers
    * replicate to the 3×3 neighborhood (a constant 9× on the SMALLER
    * side), the join runs cell-keyed, and the exact predicate
    * dx²+dy² ≤ R² evaluates only inside co-located buckets — never
    * all-pairs, the same never-all-pairs discipline as q19/q45.
    * Determinism: coordinates, squares, and the threshold compare are
    * all IEEE-exact arithmetic on md5-derived doubles — no libm; the
    * reported distance rounds a correctly-rounded sqrt. At 100 TB both
    * sides shuffle once on the cell key and density skew is bounded by
    * the uniform hash construction (real data would salt hot cells —
    * the q34/q57 device).
    */
  def q192GridSpatialJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def u(tag: String, key: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit(tag), key.cast("string"))), 1, 8), 16, 10)
        .cast("long").cast("double") / 4294967296.0 * GeoSide
    val pts = t(s, dir, "customer").select($"c_custkey",
        u("px:", $"c_custkey").as("px"), u("py:", $"c_custkey").as("py"))
      .withColumn("cx", floor($"px" / GeoRadius).cast("long"))
      .withColumn("cy", floor($"py" / GeoRadius).cast("long"))
    val centers = t(s, dir, "supplier").select($"s_suppkey",
        u("sx:", $"s_suppkey").as("sx"), u("sy:", $"s_suppkey").as("sy"))
      .withColumn("dx", explode(sequence(lit(-1), lit(1))))
      .withColumn("dy", explode(sequence(lit(-1), lit(1))))
      .select($"s_suppkey", $"sx", $"sy",
        (floor($"sx" / GeoRadius).cast("long") + $"dx").as("cx"),
        (floor($"sy" / GeoRadius).cast("long") + $"dy").as("cy"))
    pts.join(centers, Seq("cx", "cy"))
      .withColumn("dd",
        ($"px" - $"sx") * ($"px" - $"sx") + ($"py" - $"sy") * ($"py" - $"sy"))
      .filter($"dd" <= GeoRadius * GeoRadius)
      .select($"s_suppkey", $"c_custkey", round(sqrt($"dd"), 6).as("dist"))
      .orderBy($"s_suppkey", $"c_custkey")
  }

  private val q192Sql =
    s"""WITH pts AS (
      |  SELECT c_custkey,
      |    ('0x' || substr(md5('px:' || c_custkey), 1, 8))::BIGINT
      |      / 4294967296.0 * $GeoSide AS px,
      |    ('0x' || substr(md5('py:' || c_custkey), 1, 8))::BIGINT
      |      / 4294967296.0 * $GeoSide AS py
      |  FROM customer),
      |ptc AS (
      |  SELECT *, CAST(floor(px / $GeoRadius) AS BIGINT) AS cx,
      |            CAST(floor(py / $GeoRadius) AS BIGINT) AS cy FROM pts),
      |ctr AS (
      |  SELECT s_suppkey,
      |    ('0x' || substr(md5('sx:' || s_suppkey), 1, 8))::BIGINT
      |      / 4294967296.0 * $GeoSide AS sx,
      |    ('0x' || substr(md5('sy:' || s_suppkey), 1, 8))::BIGINT
      |      / 4294967296.0 * $GeoSide AS sy
      |  FROM supplier),
      |ctr9 AS (
      |  SELECT s_suppkey, sx, sy,
      |    CAST(floor(sx / $GeoRadius) AS BIGINT) + dx.d AS cx,
      |    CAST(floor(sy / $GeoRadius) AS BIGINT) + dy.d AS cy
      |  FROM ctr
      |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
      |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy)
      |SELECT s_suppkey, c_custkey,
      |  round(sqrt((px - sx) * (px - sx) + (py - sy) * (py - sy)), 6) AS dist
      |FROM ptc JOIN ctr9 USING (cx, cy)
      |WHERE (px - sx) * (px - sx) + (py - sy) * (py - sy)
      |        <= ${GeoRadius * GeoRadius}
      |ORDER BY s_suppkey, c_custkey""".stripMargin

  /** DBSCAN geometry: eps-neighborhood radius and the core-point
    * threshold (neighbors INCLUDING self ≥ MinPts — the convention
    * that makes an isolated tight pair non-core).
    */
  private val DbEps = 25.0
  private val DbMinPts = 4

  /** q201: DBSCAN (Ester et al., KDD 1996) over the q192 synthesized
    * point set, grid-accelerated: eps-cell bucketing (the q192 3×3
    * device, cell = eps) generates neighbor pairs without all-pairs;
    * points with ≥ [[DbMinPts]] neighbors (incl. self) are CORE;
    * clusters are connected components of the core–core eps-graph
    * (labels via [[Dedup.connectedComponents]] — min-id canonical, the
    * q40 machinery reused verbatim); non-core points adjacent to a
    * core join that core's cluster as BORDER (min cluster label when
    * several reach them — deterministic), everything else is NOISE
    * (cluster −1). Engine determinism: the in-circle predicate is the
    * q192 IEEE-exact comparison, and every label rule is a min. The
    * oracle pays the quadratic pair scan outright (the q22 ground-truth
    * role) and runs the q40 reach-CTE for components — same fixed
    * point, independently computed. Scale: the grid join + one
    * neighbor-count aggregate + CC on the (tiny, near-dup-sized)
    * core-edge graph.
    */
  def q201Dbscan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def u(tag: String, key: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit(tag), key.cast("string"))), 1, 8), 16, 10)
        .cast("long").cast("double") / 4294967296.0 * GeoSide
    val pts = t(s, dir, "customer").select($"c_custkey".as("id"),
        u("px:", $"c_custkey").as("x"), u("py:", $"c_custkey").as("y"))
      .persist()
    val a = pts.select($"id".as("ida"), $"x".as("xa"), $"y".as("ya"),
      floor($"x" / DbEps).cast("long").as("cx"),
      floor($"y" / DbEps).cast("long").as("cy"))
    val b = pts.select($"id".as("idb"), $"x".as("xb"), $"y".as("yb"))
      .withColumn("dx", explode(sequence(lit(-1), lit(1))))
      .withColumn("dy", explode(sequence(lit(-1), lit(1))))
      .select($"idb", $"xb", $"yb",
        (floor($"xb" / DbEps).cast("long") + $"dx").as("cx"),
        (floor($"yb" / DbEps).cast("long") + $"dy").as("cy"))
    val nbr = a.join(b, Seq("cx", "cy"))
      .filter($"ida" =!= $"idb" &&
        ($"xa" - $"xb") * ($"xa" - $"xb") +
          ($"ya" - $"yb") * ($"ya" - $"yb") <= DbEps * DbEps)
      .select($"ida", $"idb")
      .persist()
    val counts = nbr.groupBy($"ida".as("id")).agg(count(lit(1)).as("nn"))
    val roles = pts.join(counts, Seq("id"), "left")
      .select($"id", (coalesce($"nn", lit(0L)) + 1 >= DbMinPts).as("core"))
      .persist()
    val coreIds = roles.filter($"core").select($"id")
    val coreEdges = nbr
      .join(coreIds.withColumnRenamed("id", "ida"), Seq("ida"), "left_semi")
      .join(coreIds.withColumnRenamed("id", "idb"), Seq("idb"), "left_semi")
      .filter($"ida" < $"idb")
      .select($"ida".as("doc_a"), $"idb".as("doc_b"))
    val labels = Dedup.connectedComponents(coreEdges)
      .withColumnRenamed("doc_id", "id").withColumnRenamed("canonical_id", "cl")
    // isolated cores (no core neighbor) form their own singleton cluster
    val coreLab = coreIds.join(labels, Seq("id"), "left")
      .select($"id", coalesce($"cl", $"id").as("cl"))
    val borderLab = nbr
      .join(coreLab.withColumnRenamed("id", "idb"), Seq("idb"))
      .join(roles.filter(!$"core").withColumnRenamed("id", "ida")
        .select($"ida"), Seq("ida"), "left_semi")
      .groupBy($"ida".as("id")).agg(min($"cl").as("cl"))
    val out = roles
      .join(coreLab.withColumnRenamed("cl", "core_cl"), Seq("id"), "left")
      .join(borderLab.withColumnRenamed("cl", "border_cl"), Seq("id"), "left")
      .select($"id".as("c_custkey"),
        when($"core", "core")
          .when($"border_cl".isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce($"core_cl", $"border_cl", lit(-1L)).as("cluster"))
      .orderBy($"c_custkey")
    val materialized = out.persist()
    materialized.count()
    pts.unpersist(false); nbr.unpersist(false); roles.unpersist(false)
    materialized
  }

  private val q201Sql =
    s"""WITH RECURSIVE pts AS (
      |  SELECT c_custkey AS id,
      |    ('0x' || substr(md5('px:' || c_custkey), 1, 8))::BIGINT
      |      / 4294967296.0 * $GeoSide AS x,
      |    ('0x' || substr(md5('py:' || c_custkey), 1, 8))::BIGINT
      |      / 4294967296.0 * $GeoSide AS y
      |  FROM customer),
      |nbr AS (
      |  SELECT a.id AS ida, b.id AS idb
      |  FROM pts a JOIN pts b ON a.id <> b.id
      |    AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      |        <= ${DbEps * DbEps}),
      |cnt AS (SELECT ida AS id, count(*) AS nn FROM nbr GROUP BY ida),
      |roles AS (
      |  SELECT p.id, COALESCE(nn, 0) + 1 >= $DbMinPts AS core
      |  FROM pts p LEFT JOIN cnt USING (id)),
      |core_edges AS (
      |  SELECT ida AS a, idb AS b FROM nbr
      |  WHERE ida < idb
      |    AND ida IN (SELECT id FROM roles WHERE core)
      |    AND idb IN (SELECT id FROM roles WHERE core)),
      |edges AS (
      |  SELECT a, b FROM core_edges UNION ALL SELECT b, a FROM core_edges),
      |reach AS (
      |  SELECT DISTINCT a AS src, a AS dst FROM edges
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      |cc AS (SELECT src AS id, min(dst) AS cl FROM reach GROUP BY src),
      |core_lab AS (
      |  SELECT r.id, COALESCE(cc.cl, r.id) AS cl
      |  FROM roles r LEFT JOIN cc USING (id) WHERE r.core),
      |border_lab AS (
      |  SELECT n.ida AS id, min(k.cl) AS cl
      |  FROM nbr n JOIN core_lab k ON n.idb = k.id
      |  WHERE n.ida NOT IN (SELECT id FROM roles WHERE core)
      |  GROUP BY n.ida)
      |SELECT r.id AS c_custkey,
      |  CASE WHEN r.core THEN 'core'
      |       WHEN b.cl IS NOT NULL THEN 'border'
      |       ELSE 'noise' END AS role,
      |  COALESCE(k.cl, b.cl, -1) AS cluster
      |FROM roles r
      |LEFT JOIN core_lab k USING (id)
      |LEFT JOIN border_lab b USING (id)
      |ORDER BY c_custkey""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q201_dbscan", Seq("EXT-olap", "EXT-dedup", "EXT-graph"),
      "grid-accelerated DBSCAN: core/border/noise + min-label clusters, quadratic-truth oracle",
      q201Dbscan, Some(q201Sql)),
    GraftQuery("q191_adamic_adar", Seq("EXT-graph", "EXT-olap"),
      "Adamic-Adar link prediction: degree-bounded common-neighbor scoring, exact-decimal sums",
      q191AdamicAdar, Some(q191Sql)),
    GraftQuery("q192_grid_spatial_join", Seq("EXT-olap", "J1"),
      "grid-bucketed spatial radius join: 3x3 cell replication, IEEE-exact in-circle predicate",
      q192GridSpatialJoin, Some(q192Sql)))
}
