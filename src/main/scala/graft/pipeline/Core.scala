package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core layer: cr_company_complete (reference cr_company_complete.sql) —
  * the pipeline's one true join (J1): inner equi-join of the two staging
  * tables on exact company_name, then latest-row-per-company dedup (W2).
  *
  * Snowflake DESC defaults to NULLS FIRST, hence desc_nulls_first
  * (SURVEY.md §2.5 caveat). Both sides are dimension-sized (≤1000 rows)
  * — Spark auto-broadcasts under the 10 MB threshold; at warehouse scale
  * the join key would be the bucketing key instead.
  */
object Core {

  val columns: Seq[String] = Seq(
    "last_updated", "company_name", "company_order", "company_rank", "slug",
    "assets_m", "revenues_m", "profits_m", "market_value_m", "employees",
    "revenue_pct_change", "profit_pct_change",
    "headquarters_city", "headquarters_state", "industry", "sector",
    "is_best_company", "is_change_the_world", "dropped_in_rank",
    "is_future_50", "is_global_500", "is_profitable", "is_newcomer",
    "has_female_ceo", "founder_is_ceo", "is_fastest_growing",
    "is_most_admired", "change_rank_500", "change_rank_1000",
    "symbol", "cik", "date_added", "founded_year",
    "gics_sector", "gics_sub_industry")

  /** @param wikiWatermark when incremental, only wiki rows with
    *   ingested_at strictly above the core table's max(last_updated)
    *   survive — the reference's cross-source watermark quirk
    *   (cr_company_complete.sql:42-44; SURVEY.md §7.4 item 3), kept
    *   as-specified.
    */
  def crCompanyComplete(
      fortune: DataFrame,
      wiki: DataFrame,
      wikiWatermark: Option[java.sql.Timestamp] = None): DataFrame = {
    val f = fortune.as("f")
    val s = wiki.as("s")
    val joined = f.join(s, col("f.company_name") === col("s.company_name"), "inner")
    val filtered = wikiWatermark match {
      case Some(ts) => joined.filter(col("s.ingested_at") > lit(ts))
      case None => joined
    }
    val combined = filtered.select(
      col("f.ingested_at").as("last_updated"),
      col("f.company_name").as("company_name"),
      col("f.company_order").as("company_order"),
      col("f.company_rank").as("company_rank"),
      col("f.slug").as("slug"),
      col("f.assets_m").as("assets_m"),
      col("f.revenues_m").as("revenues_m"),
      col("f.profits_m").as("profits_m"),
      col("f.market_value_m").as("market_value_m"),
      col("f.employees").as("employees"),
      col("f.revenue_pct_change").as("revenue_pct_change"),
      col("f.profit_pct_change").as("profit_pct_change"),
      col("f.headquarters_city").as("headquarters_city"),
      col("f.headquarters_state").as("headquarters_state"),
      col("f.industry").as("industry"),
      col("f.sector").as("sector"),
      col("f.is_best_company").as("is_best_company"),
      col("f.is_change_the_world").as("is_change_the_world"),
      col("f.dropped_in_rank").as("dropped_in_rank"),
      col("f.is_future_50").as("is_future_50"),
      col("f.is_global_500").as("is_global_500"),
      col("f.is_profitable").as("is_profitable"),
      col("f.is_newcomer").as("is_newcomer"),
      col("f.has_female_ceo").as("has_female_ceo"),
      col("f.founder_is_ceo").as("founder_is_ceo"),
      col("f.is_fastest_growing").as("is_fastest_growing"),
      col("f.is_most_admired").as("is_most_admired"),
      col("f.change_rank_500").as("change_rank_500"),
      col("f.change_rank_1000").as("change_rank_1000"),
      col("s.symbol").as("symbol"),
      col("s.cik").as("cik"),
      col("s.date_added").as("date_added"),
      col("s.founded_year").as("founded_year"),
      col("s.gics_sector").as("gics_sector"),
      col("s.gics_sub_industry").as("gics_sub_industry"))
    val w = Window.partitionBy(col("company_name"))
      .orderBy(col("last_updated").desc_nulls_first)
    combined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
