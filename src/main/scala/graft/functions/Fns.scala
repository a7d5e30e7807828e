package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType}

/** Reusable Catalyst-expression builders ("macros", not UDFs) re-expressing
  * the reference's scalar-function surface (SURVEY.md §2.7, §2.10).
  *
  * Everything here composes `org.apache.spark.sql.functions` builtins so the
  * whole thing stays inside whole-stage codegen — zero `udf()` registrations,
  * matching the reference, which also defines zero procedural UDFs
  * (reference: the firmographics_dbt macros are expression templates).
  */
object Fns {

  /** Null sentinel used by dbt_utils.generate_surrogate_key 1.3.0
    * (reference: firmographics_dbt/packages.yml:2-3).
    */
  val SurrogateKeyNullSentinel = "_dbt_utils_surrogate_key_null_"

  /** dbt_utils.generate_surrogate_key parity (SURVEY.md §2.7 F12):
    * md5 hex of '-'-joined stringified columns with a null sentinel.
    * Reference usage: firmographics_dbt/models/star/dim_company.sql:3,
    * fact_company_performance.sql:3-5, both snapshot models line 14.
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-",
      cols.map(c => coalesce(c.cast("string"), lit(SurrogateKeyNullSentinel))): _*))

  /** parse_money_to_float macro parity (SURVEY.md §2.7 F4+F7+F9):
    * NULLIF(regexp_replace(x::string, '[$,]', ''), '')::float.
    * Reference: firmographics_dbt/macros/parse_numeric.sql:1-6.
    * Snowflake FLOAT is double precision -> DoubleType.
    */
  def parseMoneyToFloat(c: Column): Column =
    nullif(regexp_replace(c.cast("string"), "[$,]", ""), lit("")).cast("double")

  /** Lenient variant: malformed residue → NULL instead of an ANSI cast
    * error. The strict version matches Snowflake `::float` (which also
    * errors on garbage — reference parity); this is the
    * dirty-data-at-scale path where one bad row must not kill a 100 TB
    * job.
    */
  def parseMoneyToFloatLenient(c: Column): Column =
    nullif(regexp_replace(c.cast("string"), "[$,]", ""), lit("")).try_cast("double")

  /** IFF(x = 'yes', true, false) parity (SURVEY.md §2.7 F5): NULL condition
    * takes the else branch, so a missing flag becomes false, not NULL.
    * Reference: firmographics_dbt/models/staging/stg_fortune500.sql:50-60.
    */
  def yesNoFlag(c: Column): Column =
    when(c === "yes", lit(true)).otherwise(lit(false))

  /** Snowflake SPLIT(str, delim)[i] parity (SURVEY.md §2.7 F2): the
    * delimiter is a LITERAL string (Spark's split takes a regex — quote it);
    * out-of-range index yields NULL (`get` is 0-based and null-safe).
    * Reference: firmographics_dbt/models/staging/stg_wiki_sp500.sql:25,32-33.
    */
  def splitPart(c: Column, delim: String, idx: Int): Column =
    get(split(c, java.util.regex.Pattern.quote(delim)), lit(idx))

  /** NULLIF(x, '') then cast — the reference's ubiquitous clean-then-type
    * chain (SURVEY.md §2.7 F4/F9).
    */
  def nullifEmptyCast(c: Column, dt: DataType): Column =
    nullif(c, lit("")).cast(dt)

  // --------------------------------------------------------------------
  // Oracle-exact numeric aggregation.
  //
  // Double summation is order-dependent, and Spark's partial aggregation
  // order differs from any single-node oracle — so a raw sum(double) can
  // never hash-match. Money columns in the test data carry <= `scale`
  // decimal digits, so casting each row to an exact DECIMAL before the sum
  // makes the aggregate exact and engine-independent; one final cast back
  // to double is a single deterministic conversion. This mirrors what a
  // production engine does at 100 TB too: decimal money math, not float.
  // --------------------------------------------------------------------

  /** Exact sum of a money-like double column (<=2 decimal digits/row). */
  def exactSum2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum for derived products carrying up to 4 decimal digits. */
  def exactSum4(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact mean: exact decimal sum, then one deterministic double divide. */
  def exactAvg2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1))
}
