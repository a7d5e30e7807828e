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

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q122_star_join", Seq("J1", "A2", "P1", "F9"),
      "TPC-H Q5-shape 6-table star join, authored as SQL text",
      q122StarJoin, Some(q122Sql)),
    GraftQuery("q123_correlated_subquery", Seq("J1", "A1", "P6"),
      "correlated scalar subqueries, Catalyst-decorrelated, same text both engines",
      q123CorrelatedSubquery, Some(q123Sql)))
}
