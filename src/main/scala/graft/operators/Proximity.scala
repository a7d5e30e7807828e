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

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q191_adamic_adar", Seq("EXT-graph", "EXT-olap"),
      "Adamic-Adar link prediction: degree-bounded common-neighbor scoring, exact-decimal sums",
      q191AdamicAdar, Some(q191Sql)),
    GraftQuery("q192_grid_spatial_join", Seq("EXT-olap", "J1"),
      "grid-bucketed spatial radius join: 3x3 cell replication, IEEE-exact in-circle predicate",
      q192GridSpatialJoin, Some(q192Sql)))
}
