package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Exact global ranking WITHOUT the single-partition sort.
  *
  * `row_number().over(Window.orderBy(...))` is the classic scale killer:
  * Spark plans an empty-partitionSpec window as Exchange SinglePartition
  * plus a full sort on ONE task, so the whole table funnels through one
  * executor. But a global rank does not need a global funnel — it is
  * range partitioning (the same parallel exchange a global `orderBy`
  * uses) plus per-partition local ranks plus the cumulative row-count
  * offset of every preceding partition. The offsets are one P-row
  * aggregate (P = shuffle partitions — never data-scaled), the local
  * ranks are an ordinary partitioned window, and every stage is fully
  * parallel. This is the Spark re-expression of the "zipWithIndex"
  * technique, kept inside the DataFrame API so codegen and AQE still
  * apply.
  *
  * Requirement: the sort key must be UNIQUE per row (callers add a
  * tie-break column) — range partitioning splits on key-value
  * boundaries, and a duplicated key straddling two partitions would
  * otherwise make local ranks ambiguous.
  */
object GlobalRank {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** df plus a `rankCol` BIGINT column holding the exact 1-based
    * row_number under `order`, computed with range partitioning + a
    * P-row offset table instead of a single-partition window.
    */
  def withGlobalRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val parts = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    // one row per non-empty partition — the only driver-side data
    val counts = parts.groupBy($"__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val maxPid = if (counts.isEmpty) 0 else counts.keys.max
    val offsets = (0 to maxPid).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offDf = (0 to maxPid).map(p => (p, offsets(p))).toDF("__pid", "__off")
    val w = Window.partitionBy($"__pid").orderBy(order: _*)
    parts.withColumn("__rn", row_number().over(w))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(rankCol, $"__off" + $"__rn")
      .drop("__pid", "__rn", "__off")
  }

  /** q132: exact global ranking of every order by price — the operator
    * above, oracle-checked against DuckDB's `row_number() OVER (ORDER
    * BY ...)`. The rank column in the result is bit-identical to the
    * single-partition formulation while the plan stays parallel end to
    * end: a wrong offset for ANY partition would shift every rank after
    * it, so the full-table hash compare is a strong proof of the
    * offset bookkeeping.
    */
  def q132GlobalRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
    withGlobalRank(o, "rnk", $"o_totalprice".desc, $"o_orderkey".asc)
      .select($"rnk", $"o_orderkey", $"o_totalprice")
      .orderBy($"rnk")
  }

  private val q132Sql =
    """SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
      |    AS BIGINT) AS rnk,
      |  o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY rnk""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q132_global_rank", Seq("W1", "W2", "EXT-olap"),
      "exact global row_number via range partitioning + offsets, no single-partition sort",
      q132GlobalRank, Some(q132Sql)))
}
