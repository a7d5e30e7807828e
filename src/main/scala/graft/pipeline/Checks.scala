package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint library — dbt's generic + singular
  * test semantics (SURVEY.md §5.1/§5.2): each check compiles to a
  * violations query; the suite runner mirrors `dbt test` (run everything,
  * report, fail on any violation), executed once after the star layer as
  * in the reference DAG ordering (DAG:201).
  */
object Checks {

  final case class Check(table: String, name: String, violations: DataFrame => DataFrame)

  final case class CheckResult(table: String, name: String, violations: Long) {
    def passed: Boolean = violations == 0L
  }

  def notNull(c: String): DataFrame => DataFrame =
    df => df.filter(col(c).isNull)

  def unique(c: String): DataFrame => DataFrame =
    df => df.groupBy(col(c)).count().filter(col("count") > 1)

  /** dbt accepted_values compiles to `where c not in (...)` — a NULL value
    * yields NULL, which the WHERE drops, so NULLs PASS (pair with not_null
    * to forbid them, exactly as dbt schemas do).
    */
  def acceptedValues(c: String, values: Seq[Any]): DataFrame => DataFrame =
    df => df.filter(col(c).isNotNull && !col(c).isin(values: _*))

  /** dbt_utils.accepted_range: violation = outside [min,max] (bounds
    * optional, inclusive; NULLs pass, matching dbt_utils).
    */
  def acceptedRange(c: String, min: Option[Double], max: Option[Double]): DataFrame => DataFrame =
    df => {
      val lo = min.map(m => col(c) < m).getOrElse(lit(false))
      val hi = max.map(m => col(c) > m).getOrElse(lit(false))
      df.filter(col(c).isNotNull && (lo || hi))
    }

  /** dbt `relationships`: child keys with no parent (left_anti, J3). */
  def relationships(childKey: String, parent: DataFrame, parentKey: String): DataFrame => DataFrame =
    df => df.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as("__graft_parent_key")),
        col(childKey) === col("__graft_parent_key"), "left_anti")

  def singular(pred: Column): DataFrame => DataFrame =
    df => df.filter(pred)

  /** Run a suite; one small count() per check. */
  def run(tables: Map[String, DataFrame], checks: Seq[Check]): Seq[CheckResult] =
    checks.map { c =>
      CheckResult(c.table, c.name, c.violations(tables(c.table)).count())
    }

  private val flagCols = Seq(
    "is_best_company", "is_change_the_world", "dropped_in_rank",
    "is_future_50", "is_global_500", "is_profitable", "is_newcomer",
    "has_female_ceo", "founder_is_ceo", "is_fastest_growing", "is_most_admired")

  /** The reference's complete declared test surface (SURVEY.md §5.1
    * inventory + §5.2 singular), 1:1 including the deliberate asymmetry:
    * no relationships test on fact.fortune_metrics_key
    * (fact_company_performance.yml:19-21).
    */
  def referenceSuite(tables: Map[String, DataFrame]): Seq[Check] = {
    def nn(t: String, cs: String*) = cs.map(c => Check(t, s"not_null_$c", notNull(c)))
    def uq(t: String, cs: String*) = cs.map(c => Check(t, s"unique_$c", unique(c)))
    val stgF = "stg_fortune500"
    val stgW = "stg_wiki_sp500"
    val core = "cr_company_complete"

    (nn(stgF, "company_name", "company_rank", "revenues_m", "slug", "assets_m") ++
      uq(stgF, "company_name") ++
      flagCols.map(c => Check(stgF, s"accepted_values_$c",
        acceptedValues(c, Seq(true, false)))) ++
      Seq(
        Check(stgF, "accepted_range_assets_m", acceptedRange("assets_m", Some(0), None)),
        Check(stgF, "accepted_range_revenues_m", acceptedRange("revenues_m", Some(0), None)),
        Check(stgF, "accepted_range_profits_m", acceptedRange("profits_m", Some(-1e9), None)),
        Check(stgF, "accepted_range_market_value_m", acceptedRange("market_value_m", Some(0), None)),
        Check(stgF, "accepted_range_employees", acceptedRange("employees", Some(0), None)),
        Check(stgF, "accepted_range_change_rank_500",
          acceptedRange("change_rank_500", Some(-500), Some(500))),
        Check(stgF, "accepted_range_change_rank_1000",
          acceptedRange("change_rank_1000", Some(-1000), Some(1000))),
        Check(stgF, "singular_profit_not_exceed_revenue",
          singular(col("profits_m") > col("revenues_m")))) ++
      nn(stgW, "company_name", "symbol", "cik", "gics_sector", "gics_sub_industry") ++
      uq(stgW, "company_name", "symbol", "cik") ++
      Seq(Check(stgW, "accepted_range_founded_year",
        acceptedRange("founded_year", Some(1700), Some(2100)))) ++
      nn(core, "company_name", "cik", "symbol", "last_updated") ++
      uq(core, "cik") ++
      nn("dim_company", "company_key", "company_name", "symbol") ++
      uq("dim_company", "company_key") ++
      nn("dim_location", "location_key", "headquarters_city",
        "headquarters_state", "valid_from") ++
      uq("dim_location", "location_key") ++
      nn("dim_fortune_metrics", "fortune_metrics_key", "company_rank", "slug") ++
      uq("dim_fortune_metrics", "fortune_metrics_key") ++
      nn("fact_company_performance", "company_key", "location_key",
        "fortune_metrics_key", "last_updated") ++
      Seq(
        Check("fact_company_performance", "relationships_company_key_dim_company",
          relationships("company_key", tables("dim_company"), "company_key")),
        Check("fact_company_performance", "relationships_location_key_dim_location",
          relationships("location_key", tables("dim_location"), "location_key"))
        // deliberately NO relationships test for fortune_metrics_key
      ) ++
      nn("company_location_snapshot", "location_key", "dbt_valid_from") ++
      nn("fortune_metrics_snapshot", "fortune_metrics_key", "dbt_valid_from"))
  }
}
