package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{GraftQuery, Tables}

/** The spark.sql ENTRY PATH, exercised as registered queries: every
  * other query in the registry builds its plan with the DataFrame API;
  * these two are authored as SQL TEXT and handed to the same Catalyst
  * frontend — proving the engine's declared surface includes the
  * warehouse's native dialect, and exercising two optimizer passes the
  * DataFrame programs never force explicitly:
  *
  *  - q122: a 6-table star join (the TPC-H Q5 shape) — join ORDER is
  *    the optimizer's call; the right plan broadcasts every dimension
  *    and leaves exactly one fact-fact shuffle (lineitem ⋈ orders).
  *  - q123: correlated scalar subqueries — Catalyst must DECORRELATE
  *    them into an aggregate + join (RewriteCorrelatedScalarSubquery);
  *    a per-row re-execution semantics would be quadratic death at any
  *    scale.
  */
object SqlSurface {

  /** Register the parquet tables as temp views once per session (idempotent). */
  private def views(s: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables.load(s, dir, n).createOrReplaceTempView(n)
    }

  private val q122Text =
    """SELECT r_name, n_name,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
      |    AS DOUBLE), 2) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** q122: local-supplier revenue by region/nation for one order year —
    * the TPC-H Q5 join topology (fact ⋈ fact ⋈ 4 dims with the
    * s_nationkey = c_nationkey locality condition), submitted as SQL.
    * The money sum reduces as exact DECIMAL (the q110 device), the date
    * window is a pushed scan filter, and Catalyst's join reordering +
    * broadcast selection produce the star plan a 1000-executor cluster
    * wants: dims broadcast, one shuffle between the facts.
    */
  def q122StarJoin(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(q122Text)
  }

  // DuckDB runs the IDENTICAL text — the whole point of the SQL surface.
  private val q122Sql = q122Text

  private val q123Text =
    """SELECT p_partkey, p_brand, p_retailprice,
      |  (SELECT round(CAST(sum(CAST(p2.p_retailprice AS DECIMAL(12,2)))
      |     AS DOUBLE) / count(*), 4)
      |   FROM part p2 WHERE p2.p_brand = p.p_brand) AS brand_avg
      |FROM part p
      |WHERE p_retailprice >
      |  (SELECT round(CAST(sum(CAST(p3.p_retailprice AS DECIMAL(12,2)))
      |     AS DOUBLE) / count(*), 4)
      |   FROM part p3 WHERE p3.p_brand = p.p_brand)
      |ORDER BY p_partkey""".stripMargin

  /** q123: parts priced above their brand's average, with the average
    * attached — both written as CORRELATED scalar subqueries. Catalyst
    * decorrelates each into one brand-level aggregate joined back
    * (25-row broadcast), so the query costs two scans + one broadcast
    * join instead of |part| subquery re-executions; the brand average
    * reduces as exact DECIMAL and is rounded before the comparison, so
    * the kept set is engine-independent.
    */
  def q123CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(q123Text)
  }

  private val q123Sql = q123Text

  /** q127: NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM) — the
    * join variant plain `=` cannot express: NULL keys match each other
    * instead of silently dropping. Keys are made nullable by mapping the
    * modal priority class to NULL on BOTH sides (the "unknown bucket"
    * every dirty dimension has), and the join must route those rows to
    * the NULL-labeled dimension row — the behavior a MERGE on nullable
    * business keys depends on. Null-safe equality hash-partitions like
    * any equi-join (NULL is just one more key value), so the plan is a
    * normal broadcast/shuffle hash join — no fallback to non-equi.
    */
  def q127NullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
      .select($"o_orderkey",
        nullif($"o_orderpriority", lit("3-MEDIUM")).as("pk"))
    val dim = Tables.load(s, dir, "orders")
      .select(nullif($"o_orderpriority", lit("3-MEDIUM")).as("pk"))
      .distinct()
      .select($"pk",
        when($"pk".isNull, lit("UNKNOWN")).otherwise(concat(lit("P:"), $"pk"))
          .as("label"))
    orders.join(dim, orders("pk") <=> dim("pk"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"label")
  }

  private val q127Sql =
    """WITH o AS (
      |  SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS pk
      |  FROM orders),
      |d AS (
      |  SELECT DISTINCT pk,
      |    CASE WHEN pk IS NULL THEN 'UNKNOWN' ELSE 'P:' || pk END AS label
      |  FROM (SELECT DISTINCT nullif(o_orderpriority, '3-MEDIUM') AS pk
      |        FROM orders))
      |SELECT label, CAST(count(*) AS BIGINT) AS n_orders
      |FROM o JOIN d ON o.pk IS NOT DISTINCT FROM d.pk
      |GROUP BY label
      |ORDER BY label""".stripMargin

  /** q128: schema-reconciling union — `unionByName(allowMissingColumns)`
    * merges two differently-shaped projections by COLUMN NAME, filling
    * absent columns with NULL (DuckDB's `UNION ALL BY NAME`): the
    * evolving-schema append every long-lived table eventually needs
    * (v2 writers add columns; v1 readers must still union). Positional
    * UNION would silently mis-align here — customer carries (name, bal,
    * segment) and supplier (name, bal, nation) in different orders.
    */
  def q128UnionByName(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val cust = Tables.load(s, dir, "customer")
      .select($"c_name".as("party_name"),
        lit("customer").as("party_type"),
        $"c_acctbal".as("acctbal"),
        $"c_mktsegment".as("mktsegment"))
    val supp = Tables.load(s, dir, "supplier")
      .select($"s_name".as("party_name"),
        $"s_nationkey".cast("int").as("nationkey"),
        lit("supplier").as("party_type"),
        $"s_acctbal".as("acctbal"))
    cust.unionByName(supp, allowMissingColumns = true)
      .orderBy($"party_type", $"party_name")
  }

  private val q128Sql =
    """SELECT * FROM (
      |  SELECT c_name AS party_name, 'customer' AS party_type,
      |    c_acctbal AS acctbal, c_mktsegment AS mktsegment
      |  FROM customer
      |  UNION ALL BY NAME
      |  SELECT s_name AS party_name, CAST(s_nationkey AS INTEGER) AS nationkey,
      |    'supplier' AS party_type, s_acctbal AS acctbal
      |  FROM supplier)
      |ORDER BY party_type, party_name""".stripMargin

  /** q193: recursive CTE hierarchy traversal — WITH RECURSIVE landed in
    * Spark 4.0 (SPARK-24497), and this query exercises it through the
    * same spark.sql entry path as q122/q123: a 10-ary org tree over
    * customers (parent(c) = ⌊(c-1)/10⌋, root 0 — synthesized, the
    * slim tables carry no hierarchy; the q185/q192 fixture device)
    * walked from the root, materializing depth + root-to-node path,
    * then rolled up per level with exact-decimal balance sums. The
    * warehouse recursive workload (org charts, BOM explosion, account
    * rollups) the reference would push to Snowflake's CONNECT BY /
    * recursive CTEs. Catalyst plans it as an iterated union — one
    * frontier ⋈ table join per level, O(depth) ≈ O(log n) iterations
    * for a bounded-fanout tree, each shuffled on the parent key; no
    * driver-side loop, no collect. Oracle: DuckDB runs the SAME text
    * (both dialects are ANSI WITH RECURSIVE).
    */
  private val q193Text =
    """WITH RECURSIVE org(id, parent, depth, path, bal) AS (
      |  SELECT c_custkey, CAST(NULL AS BIGINT), 0,
      |    CAST(c_custkey AS VARCHAR(120)),
      |    CAST(c_acctbal AS DECIMAL(12,2))
      |  FROM customer WHERE c_custkey = 0
      |  UNION ALL
      |  SELECT c.c_custkey, o.id, o.depth + 1,
      |    CAST(o.path || '/' || CAST(c.c_custkey AS VARCHAR(20))
      |      AS VARCHAR(120)),
      |    CAST(c.c_acctbal AS DECIMAL(12,2))
      |  FROM customer c JOIN org o
      |    ON CAST(floor((c.c_custkey - 1) / 10.0) AS BIGINT) = o.id
      |   AND c.c_custkey > 0)
      |SELECT depth, CAST(count(*) AS BIGINT) AS n,
      |  min(path) AS first_path, max(path) AS last_path,
      |  CAST(sum(bal) AS DECIMAL(18,2)) AS level_bal
      |FROM org GROUP BY depth ORDER BY depth""".stripMargin

  def q193RecursiveHierarchy(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(q193Text)
  }

  /** q194: pivot → unpivot roundtrip — the wide↔long reshaping pair
    * (SQL PIVOT / UNPIVOT, pandas pivot/melt). The Spark side builds
    * the wide order-status matrix with the DataFrame pivot, then melts
    * it back with the Dataset `unpivot` API (Spark 3.4+) — null cells
    * from absent (priority, status) combos coalesced to 0 so the melt
    * is total. The oracle computes the long form DIRECTLY on a
    * priority × status spine, so the hash proves the roundtrip is the
    * identity — the property that makes reshaping safe to use in
    * pipelines. Scale: one groupBy shuffle for the pivot; the unpivot
    * is a scan-local 3× row expansion of the ALREADY-aggregated (tiny)
    * wide table.
    */
  def q194PivotUnpivot(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val statuses = Seq("F", "O", "P")
    val wide = Tables.load(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", statuses)
      .agg(count(lit(1)))
      .na.fill(0L, statuses)
    wide.unpivot(
        Array($"o_orderpriority"),
        statuses.map(col).toArray, "o_orderstatus", "n")
      .orderBy($"o_orderpriority", $"o_orderstatus")
  }

  private val q194Sql =
    """WITH spine AS (
      |  SELECT DISTINCT o_orderpriority, s.st AS o_orderstatus
      |  FROM orders CROSS JOIN (SELECT unnest(['F', 'O', 'P']) AS st) s),
      |cnt AS (
      |  SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1, 2)
      |SELECT spine.o_orderpriority, spine.o_orderstatus, COALESCE(cnt.n, 0) AS n
      |FROM spine LEFT JOIN cnt USING (o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  private val q260Text =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name ASC LIMIT 3) t
      |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin

  /** q260: LATERAL correlated subquery with ORDER BY + LIMIT — the
    * SQL-standard form of "top-K per group" (every BI tool's generated
    * shape), one query text accepted verbatim by BOTH engines (the
    * q122/q123 contract). Catalyst decorrelates the lateral into a
    * ranked window/join plan — the same physical idea as q04's window
    * dedup, reached from standard SQL instead of the DataFrame API.
    */
  def q260LateralTopk(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(q260Text)
  }

  private val q284Text =
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
      |    AS n_finished,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 2)
      |    AS finished_revenue,
      |  round(CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) /
      |    CAST(count(*) AS DOUBLE), 6) AS finished_share
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q284: the SQL-standard aggregate FILTER clause — the conditional-
    * aggregation surface BI tools emit instead of CASE-WHEN pivots,
    * one query text accepted verbatim by BOTH engines (the q122/q123/
    * q193/q260 contract). Catalyst compiles each FILTER into the same
    * conditional-aggregate physical form as the CASE encoding, so the
    * scan stays single-pass with map-side partials.
    */
  def q284FilterClause(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(q284Text)
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q284_filter_clause", Seq("EXT-olap", "A2", "F11"),
      "SQL-standard aggregate FILTER clause, same text both engines, compiled to single-pass conditional aggregates",
      q284FilterClause, Some(q284Text)),
    GraftQuery("q260_lateral_topk", Seq("EXT-olap", "W2", "J1"),
      "LATERAL correlated top-3-per-nation with ORDER BY/LIMIT, same SQL text in both engines, Catalyst-decorrelated",
      q260LateralTopk, Some(q260Text)),
    GraftQuery("q193_recursive_hierarchy", Seq("EXT-olap", "A2", "F9"),
      "WITH RECURSIVE org-tree traversal + per-level rollup, same text both engines",
      q193RecursiveHierarchy, Some(q193Text)),
    GraftQuery("q194_pivot_unpivot", Seq("EXT-olap", "A2"),
      "pivot->unpivot roundtrip proved to be the identity against a directly-computed long form",
      q194PivotUnpivot, Some(q194Sql)),
    GraftQuery("q122_star_join", Seq("J1", "A2", "P1", "F9"),
      "TPC-H Q5-shape 6-table star join, authored as SQL text",
      q122StarJoin, Some(q122Sql)),
    GraftQuery("q123_correlated_subquery", Seq("J1", "A1", "P6"),
      "correlated scalar subqueries, Catalyst-decorrelated, same text both engines",
      q123CorrelatedSubquery, Some(q123Sql)),
    GraftQuery("q127_nullsafe_join", Seq("J1", "F4", "F11"),
      "null-safe equality join routes NULL keys to the unknown bucket",
      q127NullSafeJoin, Some(q127Sql)),
    GraftQuery("q128_union_by_name", Seq("P2", "F9"),
      "schema-reconciling union by column name with null fill",
      q128UnionByName, Some(q128Sql)))
}
