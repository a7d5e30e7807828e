package graft.pipeline

import org.apache.spark.sql.types._

/** Fixed schemas for the firmographic pipeline (SURVEY.md §1).
  *
  * RAW keeps `payload` as a JSON string (the VARIANT stand-in, SURVEY.md
  * §1.2); staging parses it with these explicit StructTypes in PERMISSIVE
  * mode — missing keys become NULL columns, extra keys are ignored, which
  * reproduces the reference's schema-drift tolerance
  * (reference README.md:20: "Using JSON ensures schema drift tolerance").
  */
object Schemas {

  /** RAW layer: one row per ingested file
    * (reference DAG:111-136; README.md:312-317).
    */
  val raw: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("ingested_at", TimestampType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  /** One Wikipedia S&P 500 scrape record
    * (field accesses at stg_wiki_sp500.sql:25-33; shape FIXTURES.md §1).
    * All fields read as strings except CIK (JSON number); every cast to
    * the business type happens in staging, like the reference's `::` casts.
    */
  val wikiRecord: StructType = StructType(Seq(
    StructField("Symbol", StringType),
    StructField("Security", StringType),
    StructField("GICS Sector", StringType),
    StructField("GICS Sub-Industry", StringType),
    StructField("Headquarters Location", StringType),
    StructField("Date added", StringType),
    StructField("CIK", LongType),
    StructField("Founded", StringType)))

  /** wiki payload = one JSON array of records (DAG:51-52). */
  val wikiPayload: ArrayType = ArrayType(wikiRecord)

  /** Fortune item `data` sub-object (stg_fortune500.sql:36-63): all
    * values arrive as display strings; staging does the cleaning casts.
    */
  val fortuneData: StructType = StructType(Seq(
    "Assets ($M)", "Revenues ($M)", "Profits ($M)", "Market Value ($M)",
    "Employees", "Revenue Percent Change", "Profits Percent Change",
    "Headquarters City", "State", "Industry", "Sector",
    "Best Companies", "Change the World", "Dropped in Rank", "Future 50",
    "Global 500", "Profitable", "Newcomer to the Fortune 500", "Female CEO",
    "Founder is CEO", "Fastest Growing Companies",
    "World's Most Admired Companies",
    "Change in Rank (500 only)", "Change in Rank (Full 1000)")
    .map(StructField(_, StringType)))

  /** One Fortune ranking item (stg_fortune500.sql:15-20). */
  val fortuneItem: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("order", LongType),
    StructField("rank", LongType),
    StructField("slug", StringType),
    StructField("data", fortuneData)))

  /** fortune payload = one JSON object with an `items` array
    * (stg_fortune500.sql:23: flatten on `payload:items`).
    */
  val fortunePayload: StructType = StructType(Seq(
    StructField("items", ArrayType(fortuneItem))))
}
