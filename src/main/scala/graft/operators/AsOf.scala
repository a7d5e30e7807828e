package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

import graft.{GraftQuery, Tables}

/** As-of (point-in-time) left join — for each left row, the latest right
  * row with rightTime <= leftTime for the same key. Absent from both the
  * reference (SURVEY.md §2.3 "absent" list) and Spark's built-in join
  * types; per the preference order it is COMPOSED from built-ins (tagged
  * union + sorted window carry-forward) rather than a custom SparkPlan:
  *
  *   1. tag left/right rows and union them;
  *   2. within each key, sort by (time, side) — right rows sort before
  *      left rows at equal times, so `rt <= lt` matches inclusively;
  *   3. carry the right row forward as ONE struct with
  *      last(_, ignoreNulls) — a struct, not per-column carries, so a
  *      NULL inside a newer right row can never tear across rows;
  *   4. keep left rows, unpack the carried struct.
  *
  * Cost: one shuffle per side on the key + one window pass — never the
  * per-key cross product of the naive join-filter-argmax; state per key
  * during the pass is a single carried row, so the plan survives any
  * key cardinality (DuckDB executes its native ASOF JOIN — q35's oracle
  * — with the same merge shape).
  */
object AsOf {

  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.filterNot(_ == rightKey).toSeq // incl rightTime
    val leftCols = left.columns.toSeq
    val payloadType = StructType(payload.map(c => right.schema(c)))

    val lTagged = left.select(
      (leftCols.map(col) ++ Seq(
        col(leftKey).as("__k"),
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(payloadType).as("__r"))): _*)
    val rTagged = right.select(
      (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        col(rightKey).as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct(payload.map(col): _*).as("__r"))): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.map(c => col("__c").getField(c).as(c))): _*)
  }

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Deterministic domain alignment for the orders→events time axis: the
    * test orders span 1995–2001 while events span 2024-01 only, so a join
    * on the raw dates can never match (the round-1 oracle was vacuous —
    * all payloads NULL). `order_ts` folds each order date into the events
    * month with pure integer day arithmetic (days-since-1995 mod 28,
    * added to 2024-01-02) — identical in any engine, and starting at
    * Jan 2 so every aligned order has events strictly before it.
    */
  private def orderTs(o: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_timestamp(lit("2024-01-02 00:00:00")) +
      make_dt_interval(pmod(datediff(o, to_date(lit("1995-01-01"))), lit(28)))

  private val orderTsSql =
    "TIMESTAMP '2024-01-02 00:00:00' + to_days(CAST(" +
      "date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) % 28 AS INTEGER))"

  /** q35: point-in-time enrichment — each order gets the customer's
    * latest event at or before the order's aligned timestamp. Events only
    * cover the first 10% of the custkey range, so ~1.4k of 15k rows carry
    * a real matched payload (the round-1 all-NULL vacuity is gone) and
    * the rest exercise the left-join NULL path. The right side is first
    * reduced to one row per
    * (user, ts) with max_by so the as-of match is unambiguous in any
    * engine; the oracle is DuckDB's native ASOF LEFT JOIN.
    */
  def q35AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate",
        orderTs($"o_orderdate").as("order_ts"))
    val events = t(s, dir, "events")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("event_id"),
        max_by($"event_type", $"event_id").as("event_type"))
      .select($"user_id", $"event_id", $"event_type", $"ts")
    AsOf.join(orders, events,
        leftKey = "o_custkey", rightKey = "user_id",
        leftTime = "order_ts", rightTime = "ts")
      .withColumnRenamed("ts", "event_ts")
      .orderBy($"o_orderkey")
  }

  private val q35Sql =
    s"""WITH ev AS (
      |  SELECT user_id, ts, max(event_id) AS event_id,
      |         arg_max(event_type, event_id) AS event_type
      |  FROM events GROUP BY user_id, ts),
      |o AS (
      |  SELECT o_orderkey, o_custkey, o_orderdate, $orderTsSql AS order_ts
      |  FROM orders)
      |SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
      |       CAST(o.order_ts AS TIMESTAMP) AS order_ts,
      |       e.event_id, e.event_type, CAST(e.ts AS TIMESTAMP) AS event_ts
      |FROM o ASOF LEFT JOIN ev e
      |  ON o.o_custkey = e.user_id AND e.ts <= o.order_ts
      |ORDER BY o_orderkey""".stripMargin

  /** q36: range (interval) join — events within the 7 days BEFORE each
    * order, per customer. A naive range join is a per-key cross product;
    * the scalable Spark formulation bins the time axis by the interval
    * width and equi-joins on (key, bin) with the exact predicate applied
    * after (each right row lands in 2 bins; candidate set per left row is
    * 2 bins instead of the whole key history). The oracle is the plain
    * range-predicate join — proving the binned rewrite is lossless.
    */
  def q36RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val WindowDays = 7L
    val binSecs = WindowDays * 86400L
    val orders = t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey",
        orderTs($"o_orderdate").as("order_ts"))
      .withColumn("bin", floor(unix_timestamp($"order_ts") / binSecs))
    // each event is a candidate for order-bins [its bin, its bin + 1]
    val events = t(s, dir, "events")
      .select($"event_id", $"user_id", $"ts",
        explode(array(floor(unix_timestamp($"ts") / binSecs),
          floor(unix_timestamp($"ts") / binSecs) + 1)).as("bin"))
    orders
      .join(events, orders("o_custkey") === events("user_id") &&
        orders("bin") === events("bin") &&
        events("ts") > orders("order_ts") - expr(s"INTERVAL $WindowDays DAYS") &&
        events("ts") <= orders("order_ts"))
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_recent_events"), max($"event_id").as("last_event_id"))
      .orderBy($"o_orderkey")
  }

  private val q36Sql =
    s"""WITH o AS (
      |  SELECT o_orderkey, o_custkey, $orderTsSql AS order_ts FROM orders)
      |SELECT o_orderkey, count(*) AS n_recent_events, max(event_id) AS last_event_id
      |FROM o JOIN events
      |  ON o_custkey = user_id
      | AND ts > order_ts - INTERVAL 7 DAY
      | AND ts <= order_ts
      |GROUP BY o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** q112: NEAREST-direction as-of — each purchase pairs with the
    * temporally closest click of the same user in EITHER direction
    * (pandas merge_asof direction='nearest'; q35/q79 are the backward
    * half). Both candidates come from ONE ordered pass per user — the
    * backward carry is last(ignoreNulls) over the preceding frame, the
    * forward carry first(ignoreNulls) over the following frame — then a
    * row-local argmin picks the winner (tie -> the earlier, backward
    * click). No join at all: one shuffle on user_id, state per row is
    * two carried candidates, so the plan survives any per-user history
    * length. The two carried fields per direction cannot tear: they are
    * conditioned on the same CASE row and neither is ever NULL in it.
    * Gap arithmetic is integer MICROSECONDS (epoch_us both engines) —
    * no float time math anywhere.
    */
  def q112NearestClick(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_id", $"user_id", $"event_type", $"ts",
        unix_micros($"ts").as("us"))
    val ord = Window.partitionBy($"user_id").orderBy($"us".asc, $"event_id".asc)
    val back = ord.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = ord.rowsBetween(1, Window.unboundedFollowing)
    val isClick = $"event_type" === "click"
    val enriched = ev
      .withColumn("b_id", last(when(isClick, $"event_id"), ignoreNulls = true).over(back))
      .withColumn("b_us", last(when(isClick, $"us"), ignoreNulls = true).over(back))
      .withColumn("f_id", first(when(isClick, $"event_id"), ignoreNulls = true).over(fwd))
      .withColumn("f_us", first(when(isClick, $"us"), ignoreNulls = true).over(fwd))
      .filter($"event_type" === "purchase")
    val useBack = $"f_id".isNull ||
      ($"b_id".isNotNull && ($"us" - $"b_us") <= ($"f_us" - $"us"))
    enriched.select($"event_id".as("purchase_id"), $"user_id",
        when(useBack, $"b_id").otherwise($"f_id").as("click_id"),
        when(useBack, $"b_us" - $"us").otherwise($"f_us" - $"us").as("gap_us"),
        when($"b_id".isNull && $"f_id".isNull, lit(null).cast("string"))
          .otherwise(when(useBack, lit("back")).otherwise(lit("fwd")))
          .as("direction"))
      .orderBy($"purchase_id")
  }

  private val q112Sql =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |en AS (
      |  SELECT event_id, user_id, event_type, us,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END
      |      IGNORE NULLS) OVER wb AS b_id,
      |    last_value(CASE WHEN event_type = 'click' THEN us END
      |      IGNORE NULLS) OVER wb AS b_us,
      |    first_value(CASE WHEN event_type = 'click' THEN event_id END
      |      IGNORE NULLS) OVER wf AS f_id,
      |    first_value(CASE WHEN event_type = 'click' THEN us END
      |      IGNORE NULLS) OVER wf AS f_us
      |  FROM ev
      |  WINDOW wb AS (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |  wf AS (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
      |p AS (
      |  SELECT *, (f_id IS NULL OR (b_id IS NOT NULL
      |    AND (us - b_us) <= (f_us - us))) AS use_back
      |  FROM en WHERE event_type = 'purchase')
      |SELECT event_id AS purchase_id, user_id,
      |  CASE WHEN use_back THEN b_id ELSE f_id END AS click_id,
      |  CASE WHEN use_back THEN b_us - us ELSE f_us - us END AS gap_us,
      |  CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
      |       WHEN use_back THEN 'back' ELSE 'fwd' END AS direction
      |FROM p
      |ORDER BY purchase_id""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q35_asof_join", Seq("EXT-asof"),
      "point-in-time as-of left join (union + window carry-forward)",
      q35AsOfJoin, Some(q35Sql)),
    GraftQuery("q36_range_join", Seq("EXT-range"),
      "interval range join via time-binned equi-join", q36RangeJoin, Some(q36Sql)),
    GraftQuery("q112_nearest_asof", Seq("EXT-asof", "W1", "W2"),
      "nearest-direction as-of match (bidirectional carry + local argmin)",
      q112NearestClick, Some(q112Sql)))
}
