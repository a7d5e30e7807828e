package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, Tables}
import graft.functions.Fns._

/** The reference's relational operator surface (SURVEY.md §2.2–§2.7)
  * re-expressed over the driver's TPC-H-ish tables so the DuckDB oracle can
  * hash-check every operator. Each query's Scaladoc cites the reference
  * site whose semantics it re-expresses.
  *
  * Scale notes (100 TB posture): every query here is a declarative
  * DataFrame plan — filters/projections push to the parquet scan, small
  * dimensions are broadcast explicitly, aggregations get map-side partial
  * combine from Catalyst, and window dedups shuffle once on their
  * partition key. No collect-driven loops except the single-scalar
  * high-water-mark read, which mirrors the reference's incremental design
  * (SURVEY.md §2.2 P3) and moves one row to the driver regardless of scale.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** q01: grouped aggregation with exact money sums (SURVEY §2.4 A-family;
    * pricing-summary shape). Filter is pushed to the scan; aggregation is
    * partial+final with only (flag,status) groups shuffled.
    */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        exactSum2($"l_extendedprice").as("sum_base_price"),
        exactSum4($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        exactAvg2($"l_extendedprice").as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02: the pipeline's J1 inner equi-join shape (SURVEY §2.3 J1 —
    * cr_company_complete.sql:40-41) widened to a 3-way star join:
    * fact(orders) ⋈ dim(customer) ⋈ dim(nation), revenue per nation.
    * nation/customer are the small sides — broadcast them so the orders
    * scan never shuffles (at 100 TB the fact table stays in place).
    */
  def q02RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val nation = t(s, dir, "nation")
    orders
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        countDistinct($"o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"),
        exactSum2($"o_totalprice").as("revenue"))
      .orderBy($"n_name")
  }

  private val q02Sql =
    """SELECT n_name,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** q03: lateral-flatten / correlated unnest (SURVEY §2.3 J2 —
    * stg_wiki_sp500.sql:16-17's `lateral flatten`): explode the word array
    * of p_type keeping the parent key, then re-aggregate. `explode` of an
    * ArrayType column IS the correlated unnest; generated rows never leave
    * their partition until the final small groupBy.
    */
  def q03FlattenPartTypes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select($"p_partkey", explode(split($"p_type", " ")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("n"), countDistinct($"p_partkey").as("n_parts"))
      .orderBy($"word")
  }

  private val q03Sql =
    """SELECT word, count(*) AS n, count(DISTINCT p_partkey) AS n_parts
      |FROM (SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word FROM part)
      |GROUP BY word
      |ORDER BY word""".stripMargin

  /** q04: group-wise top-1 dedup, latest-wins (SURVEY §2.5 W2 + §2.2 P5 —
    * cr_company_complete.sql:47-52): row_number over (partition by customer
    * order by date desc) with an explicit unique tiebreak so the survivor
    * set is deterministic. One shuffle on the partition key.
    */
  def q04LatestOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc_nulls_first, $"o_orderkey".desc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .orderBy($"o_custkey")
  }

  private val q04Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC NULLS FIRST, o_orderkey DESC) AS rn
      |      FROM orders)
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  /** q05: group-wise top-1, earliest-wins with NULLS LAST (SURVEY §2.5 W1 —
    * stg_wiki_sp500.sql:37-45: Snowflake ASC defaults to NULLS LAST, so the
    * Spark side must say asc_nulls_last explicitly). l_linenumber is NOT
    * unique within an order in this corpus (sf0.1 has duplicate
    * (shipdate, linenumber) rows), so l_partkey completes the ordering —
    * a window top-1 is only engine-independent when its ORDER BY is total
    * over the OUTPUT columns.
    */
  def q05FirstLinePerOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_shipdate".asc_nulls_last, $"l_linenumber".asc, $"l_partkey".asc)
    t(s, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_shipdate")
      .orderBy($"l_orderkey")
  }

  private val q05Sql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate
      |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |        ORDER BY l_shipdate ASC NULLS LAST, l_linenumber ASC, l_partkey ASC) AS rn
      |      FROM lineitem)
      |WHERE rn = 1
      |ORDER BY l_orderkey""".stripMargin

  /** q06: high-water-mark incremental filter (SURVEY §2.2 P3 + §2.4 A1 —
    * stg_*.sql:5-7's `where ingested_at > (select max(...) from {{this}})`).
    * The scalar aggregate is collected driver-side exactly like dbt renders
    * it, then injected as a literal so Catalyst pushes the comparison into
    * the parquet scan — one row to the driver at any scale.
    */
  def q06HighWaterMark(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
    // .get (not .getTimestamp): the column may surface as TIMESTAMP_NTZ
    // (LocalDateTime) depending on the parquet writer's tz flag; lit()
    // accepts either and keeps the type.
    val hwm = orders.filter($"o_orderstatus" === "F")
      .agg(max($"o_orderdate")).first().get(0)
    orders
      .filter($"o_orderdate" > lit(hwm))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        min($"o_orderdate").as("first_date"),
        max($"o_orderdate").as("last_date"))
      .orderBy($"o_orderstatus")
  }

  private val q06Sql =
    """SELECT o_orderstatus, count(*) AS n,
      |  min(o_orderdate) AS first_date, max(o_orderdate) AS last_date
      |FROM orders
      |WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders WHERE o_orderstatus = 'F')
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** q07: referential anti-join (SURVEY §2.3 J3 — the dbt `relationships`
    * test shape, fact_company_performance.yml:10-18): customers with no
    * orders via left_anti. The orders side only needs its key column —
    * column pruning reaches the scan.
    */
  def q07CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recent = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp"))
    t(s, dir, "customer")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val q07Sql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** q08: semi-join (EXISTS) — the complement of J3's anti-join surface
    * (SURVEY §2.6 notes Spark gives semi/anti for free; declared here so
    * the oracle exercises it): customers with at least one open order.
    */
  def q08CustomersWithOpenOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val open = t(s, dir, "orders").filter($"o_orderstatus" === "O")
    t(s, dir, "customer")
      .join(open, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  private val q08Sql =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** q09: dbt_utils.generate_surrogate_key parity vectors (SURVEY §2.7 F12
    * — dim_company.sql:3, fact_company_performance.sql:3-5): md5 of
    * '-'-joined stringified columns with the dbt null sentinel, including
    * an int-typed input (stringification parity) and a forced-NULL input
    * (sentinel path).
    */
  def q09SurrogateKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .select(
        $"c_custkey",
        surrogateKey($"c_name", $"c_mktsegment").as("company_key"),
        surrogateKey($"c_name", $"c_nationkey").as("geo_key"),
        surrogateKey(nullif($"c_mktsegment", lit("BUILDING")), $"c_name").as("null_path_key"))
      .orderBy($"c_custkey")
  }

  private val q09Sql =
    """SELECT c_custkey,
      |  md5(concat_ws('-',
      |    coalesce(CAST(c_name AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      |    coalesce(CAST(c_mktsegment AS VARCHAR), '_dbt_utils_surrogate_key_null_'))) AS company_key,
      |  md5(concat_ws('-',
      |    coalesce(CAST(c_name AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      |    coalesce(CAST(c_nationkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'))) AS geo_key,
      |  md5(concat_ws('-',
      |    coalesce(CAST(nullif(c_mktsegment, 'BUILDING') AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      |    coalesce(CAST(c_name AS VARCHAR), '_dbt_utils_surrogate_key_null_'))) AS null_path_key
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** q10: the staging layer's string-surgery chain (SURVEY §2.7 F2/F3/F4/
    * F7/F8/F9 — stg_wiki_sp500.sql:25-33, macros/parse_numeric.sql):
    * literal-delimiter split-part, substring+cast, nullif-empty, the
    * money-string parser round-tripped through an exact decimal rendering,
    * and coalesce defaults. All builtins — one narrow projection over the
    * scan.
    */
  def q10StringSurgery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select(
        $"p_partkey",
        splitPart($"p_name", " ", 0).as("first_word"),
        splitPart($"p_name", " ", 1).as("name_word2"),
        substring($"p_brand", 7, 2).cast("int").as("brand_num"),
        coalesce(nullif(splitPart($"p_type", " ", 0), lit("STANDARD")), lit("other")).as("type_class"),
        parseMoneyToFloat(concat(lit("$"), $"p_retailprice".cast("decimal(18,2)").cast("string")))
          .as("retail_parsed"))
      .orderBy($"p_partkey")
  }

  private val q10Sql =
    """SELECT p_partkey,
      |  string_split(p_name, ' ')[1] AS first_word,
      |  string_split(p_name, ' ')[2] AS name_word2,
      |  CAST(substring(p_brand, 7, 2) AS INTEGER) AS brand_num,
      |  coalesce(nullif(string_split(p_type, ' ')[1], 'STANDARD'), 'other') AS type_class,
      |  CAST(nullif(regexp_replace('$' || CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS VARCHAR), '[$,]', '', 'g'), '') AS DOUBLE) AS retail_parsed
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** q11: two-armed conditionals with NULL-to-else semantics (SURVEY §2.7
    * F5/F11 — stg_fortune500.sql:50-60's IFF flags): flag columns derived
    * with when/otherwise, then aggregated.
    */
  def q11ConditionalFlags(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select(
        when($"o_orderpriority" === "1-URGENT", lit(true)).otherwise(lit(false)).as("is_urgent"),
        when($"o_totalprice" > 200000.0, lit("big")).otherwise(lit("small")).as("size_class"))
      .groupBy($"is_urgent", $"size_class")
      .agg(count(lit(1)).as("n"))
      .orderBy($"is_urgent", $"size_class")
  }

  private val q11Sql =
    """SELECT
      |  CASE WHEN o_orderpriority = '1-URGENT' THEN true ELSE false END AS is_urgent,
      |  CASE WHEN o_totalprice > 200000.0 THEN 'big' ELSE 'small' END AS size_class,
      |  count(*) AS n
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY is_urgent, size_class""".stripMargin

  /** q12: the declarative data-quality surface run as one query (SURVEY §5
    * — dbt test semantics): each row is one check with its violation
    * count; not_null / unique / accepted_values / accepted_range /
    * relationships / the singular-predicate shape
    * (test_fortune_profit_not_exceed_revenue.sql). Checks run as
    * independent small aggregates unioned at the end.
    */
  def q12DataQualityChecks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    def one(name: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).cast("long").as("violations"))
        .select(lit(name).as("check_name"), $"violations")
    one("not_null_c_name", c.filter($"c_name".isNull))
      .unionByName(one("unique_o_orderkey",
        o.groupBy($"o_orderkey").count().filter($"count" > 1)))
      .unionByName(one("accepted_values_l_returnflag",
        li.filter(!$"l_returnflag".isin("A", "N", "R"))))
      .unionByName(one("accepted_range_l_discount",
        li.filter($"l_discount" < 0.0 || $"l_discount" > 0.1)))
      .unionByName(one("relationships_lineitem_orders",
        li.join(o, $"l_orderkey" === $"o_orderkey", "left_anti")))
      .unionByName(one("singular_tax_not_exceed_discount_plus_cap",
        li.filter($"l_tax" > $"l_discount" + 0.1)))
      .orderBy($"check_name")
  }

  private val q12Sql =
    """SELECT check_name, violations FROM (
      |  SELECT 'not_null_c_name' AS check_name, count(*) AS violations FROM customer WHERE c_name IS NULL
      |  UNION ALL
      |  SELECT 'unique_o_orderkey', count(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
      |  UNION ALL
      |  SELECT 'accepted_values_l_returnflag', count(*) FROM lineitem WHERE l_returnflag NOT IN ('A','N','R')
      |  UNION ALL
      |  SELECT 'accepted_range_l_discount', count(*) FROM lineitem WHERE l_discount < 0.0 OR l_discount > 0.1
      |  UNION ALL
      |  SELECT 'relationships_lineitem_orders', count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |  UNION ALL
      |  SELECT 'singular_tax_not_exceed_discount_plus_cap', count(*) FROM lineitem WHERE l_tax > l_discount + 0.1
      |)
      |ORDER BY check_name""".stripMargin

  /** q13: event-time tumbling-window aggregation + JSON path extraction
    * (SURVEY §2.7 F1's VARIANT-path access; §2.8 — the streaming-shaped
    * surface, here as the batch-equivalent plan a Structured Streaming
    * query would produce for a 1-hour tumble): date_trunc window, JSON
    * field pulled with get_json_object, exact decimal sums.
    */
  def q13EventsHourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select(
        date_trunc("hour", $"ts").as("hour"),
        $"event_type",
        $"value",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"hour", $"event_type")
      .agg(
        count(lit(1)).as("n"),
        exactSum2($"value").as("total_value"),
        sum($"k").as("sum_k"))
      .orderBy($"hour", $"event_type")
  }

  private val q13Sql =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  /** q14: sessionization — gaps-and-islands over event time (the classic
    * stateful-streaming computation, expressed relationally so it scales
    * and the oracle can check it; the Structured Streaming twin lives in
    * graft.streaming): a new session starts after a >30min gap; one
    * shuffle on user_id, two window passes over the same partitioning.
    */
  def q14Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    t(s, dir, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800L, 1L).otherwise(0L))
      .withColumn("session_seq", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min($"ts").as("session_start"),
        max($"ts").as("session_end"))
      .orderBy($"user_id", $"session_seq")
  }

  private val q14Sql =
    """SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, count(*) AS n_events,
      |  CAST(min(ts) AS TIMESTAMP) AS session_start,
      |  CAST(max(ts) AS TIMESTAMP) AS session_end
      |FROM (
      |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM (
      |    SELECT *, CASE WHEN prev_ts IS NULL
      |                OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
      |    FROM (
      |      SELECT event_id, ts, user_id,
      |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |      FROM events)))
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** q67: ordered funnel analysis with conversion windows — the classic
    * event-sequence operator (match_recognize's most common real use):
    * users who viewed, then clicked within 24 h of the FIRST view, then
    * purchased within 24 h of that first qualifying click. Each step is
    * anchored on the previous step's min-timestamp, so the match is the
    * deterministic leftmost one. Plan: three passes over events, each
    * pruned to one event type at the scan (pushed filter) and shuffled
    * by user once; the qualifying-user sets shrink monotonically
    * (1500 → 536 → 217 at sf0.1), so steps 2-3 join against
    * broadcast-sized anchors. At 100 TB the same three-anchor chain
    * holds — or collapses to one shuffle via per-user sorted folding
    * (the q14 sessionize shape) when step count grows.
    */
  def q67Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events").select($"user_id", $"event_type", $"ts")
    val day = expr("INTERVAL 24 HOURS")
    // Each anchor table is persisted: the step chain references t1
    // three times (directly + through t2/t3's lineage) and t2 twice, so
    // without materialization the events scan replays 6 times — with
    // it, exactly once per step (3 scans, each type-pruned at the scan).
    val t1 = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
      .persist()
    val t2 = e.join(broadcast(t1), "user_id")
      .filter($"event_type" === "click" &&
        $"ts" > $"t_view" && $"ts" <= $"t_view" + day)
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
      .persist()
    val t3 = e.join(broadcast(t2), "user_id")
      .filter($"event_type" === "purchase" &&
        $"ts" > $"t_click" && $"ts" <= $"t_click" + day)
      .groupBy($"user_id").agg(min($"ts").as("t_buy"))
    t1.agg(count(lit(1)).as("users")).select(lit("1_view").as("step"), $"users")
      .unionByName(t2.agg(count(lit(1)).as("users"))
        .select(lit("2_click_24h").as("step"), $"users"))
      .unionByName(t3.agg(count(lit(1)).as("users"))
        .select(lit("3_purchase_24h").as("step"), $"users"))
      .orderBy($"step")
  }

  private val q67Sql =
    """WITH t1 AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (
      |  SELECT e.user_id, min(ts) AS t_click
      |  FROM events e JOIN t1 USING (user_id)
      |  WHERE event_type = 'click' AND ts > t_view
      |    AND ts <= t_view + INTERVAL 24 HOUR
      |  GROUP BY e.user_id),
      |t3 AS (
      |  SELECT e.user_id, min(ts) AS t_buy
      |  FROM events e JOIN t2 USING (user_id)
      |  WHERE event_type = 'purchase' AND ts > t_click
      |    AND ts <= t_click + INTERVAL 24 HOUR
      |  GROUP BY e.user_id)
      |SELECT '1_view' AS step, (SELECT count(*) FROM t1) AS users
      |UNION ALL
      |SELECT '2_click_24h', (SELECT count(*) FROM t2)
      |UNION ALL
      |SELECT '3_purchase_24h', (SELECT count(*) FROM t3)
      |ORDER BY step""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q67_funnel", Seq("EXT-funnel", "A1", "J1"),
      "ordered 3-step funnel with 24h conversion windows (leftmost match)",
      q67Funnel, Some(q67Sql)),
    GraftQuery("q01_pricing_summary", Seq("A2", "A3", "P1", "F9"),
      "grouped aggregation, exact money sums", q01PricingSummary, Some(q01Sql)),
    GraftQuery("q02_revenue_by_nation", Seq("J1", "A2", "P1"),
      "3-way broadcast star join + agg", q02RevenueByNation, Some(q02Sql)),
    GraftQuery("q03_flatten_part_types", Seq("J2"),
      "lateral flatten (explode) + re-agg", q03FlattenPartTypes, Some(q03Sql)),
    GraftQuery("q04_latest_order_per_customer", Seq("W2", "P5"),
      "latest-wins window dedup", q04LatestOrderPerCustomer, Some(q04Sql)),
    GraftQuery("q05_first_line_per_order", Seq("W1", "P5"),
      "earliest-wins window dedup, NULLS LAST", q05FirstLinePerOrder, Some(q05Sql)),
    GraftQuery("q06_high_water_mark", Seq("P3", "A1"),
      "incremental high-water-mark filter", q06HighWaterMark, Some(q06Sql)),
    GraftQuery("q07_customers_without_orders", Seq("J3"),
      "referential anti-join", q07CustomersWithoutOrders, Some(q07Sql)),
    GraftQuery("q08_customers_with_open_orders", Seq("J3"),
      "semi-join (EXISTS)", q08CustomersWithOpenOrders, Some(q08Sql)),
    GraftQuery("q09_surrogate_keys", Seq("F12"),
      "dbt_utils surrogate-key parity", q09SurrogateKeys, Some(q09Sql)),
    GraftQuery("q10_string_surgery", Seq("F2", "F3", "F4", "F7", "F8", "F9"),
      "staging string-cleaning chain", q10StringSurgery, Some(q10Sql)),
    GraftQuery("q11_conditional_flags", Seq("F5", "F11"),
      "IFF-style conditional flags", q11ConditionalFlags, Some(q11Sql)),
    GraftQuery("q12_dq_checks", Seq("P6", "A2", "J3"),
      "declarative data-quality suite", q12DataQualityChecks, Some(q12Sql)),
    GraftQuery("q13_events_hourly", Seq("F1", "A2"),
      "event-time tumbling window + JSON extraction", q13EventsHourly, Some(q13Sql)),
    GraftQuery("q14_sessionize", Seq("W1", "W2"),
      "sessionization (gaps-and-islands)", q14Sessionize, Some(q14Sql)))
}
