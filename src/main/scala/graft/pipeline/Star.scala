package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Fns.surrogateKey

/** Star layer (reference models/star): three current-only dimensions and
  * the performance fact, all keyed by dbt_utils MD5 surrogate keys (F12).
  * Dims read snapshots filtered to open versions (P4:
  * `where dbt_valid_to is null`); the fact re-derives its three keys from
  * core, exactly as the reference does.
  */
object Star {

  /** dim_company (dim_company.sql:2-9): full-refresh projection of core. */
  def dimCompany(core: DataFrame): DataFrame =
    core.select(
      surrogateKey(col("company_name"), col("symbol")).as("company_key"),
      col("symbol"), col("company_name"), col("industry"), col("sector"),
      col("cik"), col("founded_year"))

  /** Snapshot input for company_location_snapshot
    * (company_location_snapshot.sql:13-18). NB the key CONTAINS the
    * tracked attributes — an HQ move changes the key itself (SURVEY.md
    * §2.9 subtlety).
    */
  def locationSnapshotBatch(core: DataFrame): DataFrame =
    core.select(
      surrogateKey(col("company_name"), col("headquarters_city"),
        col("headquarters_state")).as("location_key"),
      col("headquarters_city"), col("headquarters_state"), col("last_updated"))

  /** Snapshot input for fortune_metrics_snapshot
    * (fortune_metrics_snapshot.sql:13-31).
    */
  def fortuneMetricsSnapshotBatch(core: DataFrame): DataFrame =
    core.select(
      surrogateKey(col("company_name"), col("slug")).as("fortune_metrics_key"),
      col("company_order"), col("company_rank"), col("slug"),
      col("is_best_company"), col("is_change_the_world"), col("dropped_in_rank"),
      col("is_future_50"), col("is_global_500"), col("is_profitable"),
      col("is_newcomer"), col("has_female_ceo"), col("founder_is_ceo"),
      col("is_fastest_growing"), col("is_most_admired"),
      col("change_rank_500"), col("change_rank_1000"), col("last_updated"))

  /** dim_location (dim_location.sql:2-7): current versions only. */
  def dimLocation(locationSnapshot: DataFrame): DataFrame =
    locationSnapshot
      .filter(col("dbt_valid_to").isNull)
      .select(col("location_key"), col("headquarters_city"),
        col("headquarters_state"), col("dbt_valid_from").as("valid_from"))

  /** dim_fortune_metrics (dim_fortune_metrics.sql:2-22): current only. */
  def dimFortuneMetrics(metricsSnapshot: DataFrame): DataFrame =
    metricsSnapshot
      .filter(col("dbt_valid_to").isNull)
      .select(
        col("fortune_metrics_key"), col("company_order"), col("company_rank"),
        col("slug"), col("is_best_company"), col("is_change_the_world"),
        col("dropped_in_rank"), col("is_future_50"), col("is_global_500"),
        col("is_profitable"), col("is_newcomer"), col("has_female_ceo"),
        col("founder_is_ceo"), col("is_fastest_growing"), col("is_most_admired"),
        col("change_rank_500"), col("change_rank_1000"),
        col("dbt_valid_from").as("valid_from"))

  /** fact_company_performance (fact_company_performance.sql:2-18). */
  def factCompanyPerformance(core: DataFrame): DataFrame =
    core.select(
      surrogateKey(col("company_name"), col("symbol")).as("company_key"),
      surrogateKey(col("company_name"), col("headquarters_city"),
        col("headquarters_state")).as("location_key"),
      surrogateKey(col("company_name"), col("slug")).as("fortune_metrics_key"),
      col("assets_m"), col("revenues_m"), col("profits_m"),
      col("market_value_m"), col("revenue_pct_change"),
      col("profit_pct_change"), col("employees"), col("last_updated"))
}
