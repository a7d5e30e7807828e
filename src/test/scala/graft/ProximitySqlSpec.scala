package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q191–q194 (link prediction, spatial join,
  * recursive CTE, pivot/unpivot) beyond the oracle hash.
  */
class ProximitySqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q191: predicted links are non-edges with >=1 common neighbor, positive scores") {
    import spark.implicits._
    val out = operators.Proximity.q191AdamicAdar(spark, dir).persist()
    assert(out.count() > 0)
    assert(out.filter($"x" >= $"z").count() == 0)
    assert(out.filter($"common" < 1 || $"score" <= 0).count() == 0)
    // more common neighbors can only help when degrees are equal;
    // weaker sanity: score is monotone in common at fixed max score
    assert(out.filter($"score" > $"common" * 2).count() == 0,
      "score exceeds the 1/ln(2)-per-neighbor ceiling")
    out.unpersist(false)
  }

  test("q192: grid join equals the brute-force radius join exactly") {
    import spark.implicits._
    val out = operators.Proximity.q192GridSpatialJoin(spark, dir)
      .select($"s_suppkey", $"c_custkey")
    // independent brute force (all pairs, no grid) — proves the 3x3
    // neighborhood loses nothing and adds nothing
    def u(tag: String, c: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit(tag), c.cast("string"))), 1, 8), 16, 10)
        .cast("long").cast("double") / 4294967296.0 * 1000.0
    val pts = Tables.load(spark, dir, "customer")
      .select($"c_custkey", u("px:", $"c_custkey").as("px"), u("py:", $"c_custkey").as("py"))
    val ctr = Tables.load(spark, dir, "supplier")
      .select($"s_suppkey", u("sx:", $"s_suppkey").as("sx"), u("sy:", $"s_suppkey").as("sy"))
    val brute = pts.crossJoin(ctr)
      .filter(($"px" - $"sx") * ($"px" - $"sx") +
        ($"py" - $"sy") * ($"py" - $"sy") <= 50.0 * 50.0)
      .select($"s_suppkey", $"c_custkey")
    assert(out.exceptAll(brute).count() == 0 && brute.exceptAll(out).count() == 0)
  }

  test("q201: DBSCAN roles satisfy their definitions against a brute-force neighbor count") {
    import spark.implicits._
    val out = operators.Proximity.q201Dbscan(spark, dir).persist()
    assert(out.count() == Tables.load(spark, dir, "customer").count())
    // brute-force neighbor counts (incl. self) at eps = 25
    def u(tag: String, c: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit(tag), c.cast("string"))), 1, 8), 16, 10)
        .cast("long").cast("double") / 4294967296.0 * 1000.0
    val pts = Tables.load(spark, dir, "customer")
      .select($"c_custkey".as("id"), u("px:", $"c_custkey").as("x"),
        u("py:", $"c_custkey").as("y"))
    val nn = pts.as("a").crossJoin(pts.as("b"))
      .filter(($"a.x" - $"b.x") * ($"a.x" - $"b.x") +
        ($"a.y" - $"b.y") * ($"a.y" - $"b.y") <= 625.0)
      .groupBy($"a.id".as("c_custkey")).agg(count(lit(1)).as("nn"))
    val j = out.join(nn, "c_custkey").persist()
    assert(j.filter($"role" === "core" && $"nn" < 4).count() == 0)
    assert(j.filter($"role" =!= "core" && $"nn" >= 4).count() == 0)
    // noise ⇔ cluster = -1; clustered points carry a member id as label
    assert(out.filter(($"role" === "noise") =!= ($"cluster" === -1L)).count() == 0)
    assert(out.filter($"role" === "core" && $"cluster" > $"c_custkey").count() == 0,
      "min-label canonicalization violated: a core's label exceeds its own id")
    j.unpersist(false); out.unpersist(false)
  }

  test("q193: recursion covers every customer exactly once; root level is a single node") {
    import spark.implicits._
    val out = operators.SqlSurface.q193RecursiveHierarchy(spark, dir).persist()
    val total = out.agg(sum($"n")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, dir, "customer").count())
    val d0 = out.filter($"depth" === 0).select($"n", $"first_path").collect()(0)
    assert(d0.getLong(0) == 1 && d0.getString(1) == "0")
    // 10-ary tree: level k holds at most 10^k nodes
    assert(out.filter($"n" > pow(lit(10.0), $"depth")).count() == 0)
    out.unpersist(false)
  }

  test("q194: melt is total over the priority x status spine and preserves the grand total") {
    import spark.implicits._
    val out = operators.SqlSurface.q194PivotUnpivot(spark, dir).persist()
    val nPrio = Tables.load(spark, dir, "orders")
      .select($"o_orderpriority").distinct().count()
    assert(out.count() == nPrio * 3)
    val total = out.agg(sum($"n")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, dir, "orders").count())
    out.unpersist(false)
  }
}
