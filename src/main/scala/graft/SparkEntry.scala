package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is declared in [[Registry]] as a
  * [[GraftQuery]]: a Spark implementation plus (where SQL-expressible) a
  * DuckDB oracle over the same parquet tables. The SURVEY.md §2 operator
  * ids each query exercises are carried in `surveyOps`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the 3-way broadcast star join + exact-money aggregation (J1 shape).
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q02RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
