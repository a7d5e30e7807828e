package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Fns._

/** Staging models: RAW JSON → flat typed tables, faithful to
  * stg_wiki_sp500.sql and stg_fortune500.sql (SURVEY.md §2).
  *
  * Each model is a pure `DataFrame => DataFrame` over the (already
  * watermark-filtered, when incremental) RAW slice; the incremental
  * branch + upsert write live in [[Pipeline]], mirroring how dbt wraps
  * the model SELECT in its materialization.
  */
object Staging {

  /** stg_wiki_sp500 (reference stg_wiki_sp500.sql:1-60):
    * flatten the payload array (J2), extract+clean+type (F1-F5, F9),
    * dedup earliest-added row per CIK (W1+P5). Snowflake ASC is NULLS
    * LAST — hence asc_nulls_last on the nullable date_added.
    */
  def stgWikiSp500(raw: DataFrame): DataFrame = {
    val flattened = raw
      .select(
        col("id").as("raw_id"),
        col("ingested_at"),
        col("source"),
        explode(from_json(col("payload"), Schemas.wikiPayload)).as("data"))
    val hq = col("data").getField("Headquarters Location")
    val cleaned = flattened.select(
      col("raw_id"),
      col("ingested_at"),
      col("source"),
      splitPart(col("data").getField("Security"), " (", 0).cast("string").as("company_name"),
      col("data").getField("Symbol").cast("string").as("symbol"),
      col("data").getField("CIK").cast("int").as("cik"),
      nullif(col("data").getField("Date added"), lit("")).cast("date").as("date_added"),
      substring(col("data").getField("Founded"), 1, 4).cast("int").as("founded_year"),
      col("data").getField("GICS Sector").cast("string").as("gics_sector"),
      col("data").getField("GICS Sub-Industry").cast("string").as("gics_sub_industry"),
      when(hq === "none", lit(null)).otherwise(splitPart(hq, ", ", 0))
        .cast("string").as("headquarters_location_city"),
      when(hq === "none", lit(null)).otherwise(splitPart(hq, ", ", 1))
        .cast("string").as("headquarters_location_country"))
    val w = Window.partitionBy(col("cik")).orderBy(col("date_added").asc_nulls_last)
    cleaned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** stg_fortune500 (reference stg_fortune500.sql:1-67):
    * flatten `payload:items` (J2), envelope fields + money/pct/flag
    * cleaning (F1, F4-F8). No in-batch dedup — uniqueness rides on the
    * merge key, as in the reference (SURVEY.md §7.4 item 3).
    */
  def stgFortune500(raw: DataFrame): DataFrame = {
    val flattened = raw
      .select(
        col("id").as("raw_id"),
        col("ingested_at"),
        col("source"),
        explode(from_json(col("payload"), Schemas.fortunePayload).getField("items")).as("item"))
      .select(
        col("raw_id"), col("ingested_at"), col("source"),
        col("item").getField("data").as("data"),
        col("item").getField("name").cast("string").as("company_name"),
        col("item").getField("order").cast("int").as("company_order"),
        col("item").getField("rank").cast("int").as("company_rank"),
        col("item").getField("slug").cast("string").as("slug"))
    def f(field: String) = col("data").getField(field)
    def flag(field: String) = yesNoFlag(f(field))
    flattened.select(
      col("raw_id"),
      col("ingested_at"),
      col("source"),
      col("company_name"),
      col("company_order"),
      col("company_rank"),
      col("slug"),
      parseMoneyToFloat(f("Assets ($M)")).as("assets_m"),
      parseMoneyToFloat(f("Revenues ($M)")).as("revenues_m"),
      parseMoneyToFloat(f("Profits ($M)")).as("profits_m"),
      parseMoneyToFloat(f("Market Value ($M)")).as("market_value_m"),
      nullif(replace(f("Employees").cast("string"), lit(","), lit("")), lit(""))
        .cast("int").as("employees"),
      coalesce(nullif(replace(f("Revenue Percent Change").cast("string"), lit("%"), lit("")), lit(""))
        .cast("double"), lit(0.0)).as("revenue_pct_change"),
      coalesce(nullif(replace(f("Profits Percent Change").cast("string"), lit("%"), lit("")), lit(""))
        .cast("double"), lit(0.0)).as("profit_pct_change"),
      f("Headquarters City").cast("string").as("headquarters_city"),
      f("State").cast("string").as("headquarters_state"),
      f("Industry").cast("string").as("industry"),
      f("Sector").cast("string").as("sector"),
      flag("Best Companies").as("is_best_company"),
      flag("Change the World").as("is_change_the_world"),
      flag("Dropped in Rank").as("dropped_in_rank"),
      flag("Future 50").as("is_future_50"),
      flag("Global 500").as("is_global_500"),
      flag("Profitable").as("is_profitable"),
      flag("Newcomer to the Fortune 500").as("is_newcomer"),
      flag("Female CEO").as("has_female_ceo"),
      flag("Founder is CEO").as("founder_is_ceo"),
      flag("Fastest Growing Companies").as("is_fastest_growing"),
      flag("World's Most Admired Companies").as("is_most_admired"),
      coalesce(nullif(f("Change in Rank (500 only)").cast("string"), lit("")).cast("double"), lit(0.0))
        .as("change_rank_500"),
      coalesce(nullif(f("Change in Rank (Full 1000)").cast("string"), lit("")).cast("double"), lit(0.0))
        .as("change_rank_1000"))
  }
}
