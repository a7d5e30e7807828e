package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Platform-surface operators (round 9, batch 4): the warehouse
  * features around the queries — complex-event pattern matching
  * (MATCH_RECOGNIZE's workload), policy-driven column masking +
  * row-level security (the Snowflake governance layer the reference's
  * deployment would lean on — dbt_project.yml grants/permissions stop
  * at the warehouse boundary), weighted quantiles, and join-key
  * discovery (schema profiling). All oracle-carried.
  */
object Platform {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- q195

  /** The CEP pattern: a `view` eventually followed by a `purchase`
    * with no intervening `error` (letters are event-type initials —
    * v/c/p/s/e are distinct in this domain). Greedy leftmost match,
    * identical under Java regex and RE2.
    */
  private val CepPattern = "v[csv]*p"

  /** q195: complex-event pattern matching — the MATCH_RECOGNIZE /
    * Flink-CEP workload, re-expressed for batch Spark: sessionize (the
    * q14 gaps-and-islands device, 30-min gap), fold each session's
    * events into an ordered type-initial string (array_sort over
    * (ts, event_id, letter) structs — collect_list alone is
    * NON-deterministic, the sort makes the fold engine-exact), then
    * run the pattern as a regex over the session string: conversion
    * sessions = `view` reaching `purchase` with no `error` between.
    * Regex-over-folded-sequence is the scalable CEP encoding: state
    * machines per key become ONE codegen'd projection, sessions are
    * bounded by the gap rule so the folded string cannot grow
    * unboundedly, and the whole query is one user-keyed shuffle
    * (window + groupBy share the partitioning). The q67 funnel is the
    * anchored 3-step special case; this is the general-pattern form.
    */
  def q195EventPattern(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    t(s, dir, "events")
      .select($"event_id", $"ts", $"user_id",
        substring($"event_type", 1, 1).as("l"))
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_seq")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"ts", $"event_id", $"l"))),
          x => x.getField("l")), "").as("seq"))
      .select($"user_id", $"session_seq", $"seq",
        $"seq".rlike(CepPattern).as("matched"),
        regexp_extract($"seq", CepPattern, 0).as("match_str"))
      .orderBy($"user_id", $"session_seq")
  }

  private val q195Sql =
    s"""WITH lagged AS (
      |  SELECT event_id, ts, user_id, substr(event_type, 1, 1) AS l,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |marked AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |    OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM lagged),
      |sess AS (
      |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS session_seq
      |  FROM marked),
      |folded AS (
      |  SELECT user_id, session_seq,
      |    string_agg(l, '' ORDER BY ts, event_id) AS seq
      |  FROM sess GROUP BY user_id, session_seq)
      |SELECT user_id, session_seq, seq,
      |  regexp_matches(seq, '$CepPattern') AS matched,
      |  regexp_extract(seq, '$CepPattern', 0) AS match_str
      |FROM folded ORDER BY user_id, session_seq""".stripMargin

  // ---------------------------------------------------------------- q196

  /** q196: policy-driven column masking + row-level security — the
    * warehouse governance surface (Snowflake MASKING POLICY / ROW
    * ACCESS POLICY, Databricks column masks) as an engine operator:
    * [[maskedView]] applies a role's policy to the customer table —
    * analysts get names truncated to a 3-char prefix + '***', balances
    * generalized to their 100-bucket floor, and rows restricted to the
    * ASIA region (row policy via a broadcast dimension semi-join);
    * admins read clear. The query emits BOTH role views unioned with a
    * `role` column, so the oracle hash pins the exact masked rendering
    * AND the row-policy cut. Masking is scan-local (codegen'd string +
    * integer ops — floor-bucketing is exact, no float rounding); the
    * row filter is a 2-dim broadcast join that collapses to a pushed
    * IN-filter at any scale.
    */
  def maskedView(s: SparkSession, dir: String, role: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
    val base =
      if (role == "admin") cust
      else {
        val asiaNations = t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey")
        cust.join(broadcast(asiaNations),
          $"c_nationkey" === $"n_nationkey", "left_semi")
      }
    val name =
      if (role == "admin") $"c_name"
      else concat(substring($"c_name", 1, 3), lit("***"))
    val bal =
      if (role == "admin") $"c_acctbal"
      else (floor($"c_acctbal" / 100.0) * 100.0).cast("double")
    base.select(lit(role).as("role"), $"c_custkey",
      name.as("c_name"), bal.as("c_acctbal"), $"c_mktsegment")
  }

  def q196MaskedView(s: SparkSession, dir: String): DataFrame =
    maskedView(s, dir, "admin")
      .unionByName(maskedView(s, dir, "analyst"))
      .orderBy(col("role"), col("c_custkey"))

  private val q196Sql =
    """SELECT 'admin' AS role, c_custkey, c_name, c_acctbal, c_mktsegment
      |FROM customer
      |UNION ALL
      |SELECT 'analyst' AS role, c_custkey,
      |  substr(c_name, 1, 3) || '***' AS c_name,
      |  CAST(floor(c_acctbal / 100.0) * 100.0 AS DOUBLE) AS c_acctbal,
      |  c_mktsegment
      |FROM customer
      |WHERE c_nationkey IN (
      |  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA')
      |ORDER BY role, c_custkey""".stripMargin

  // ---------------------------------------------------------------- q197

  /** q197: weighted median per group — the weighted-quantile shape
    * (order-count-weighted account balance per market segment): the
    * smallest value whose running weight reaches half the group
    * total, computed with an integer-exact `2·cum ≥ total` crossing
    * test (no float division anywhere near the cut). Plan: one
    * groupBy(custkey) for the weights, one segment-keyed window for
    * the running sum, one aggregate for the answer — the exact-order
    * statistic that q68's GK sketch approximates when groups stop
    * fitting a partition.
    */
  def q197WeightedMedian(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wts = t(s, dir, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)).as("w"))
    val vals = t(s, dir, "customer")
      .join(wts, $"c_custkey" === $"o_custkey")
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal", $"w")
    val bySeg = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".asc, $"c_custkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals
      .withColumn("cum", sum($"w").over(bySeg))
      .withColumn("tot", sum($"w").over(Window.partitionBy($"c_mktsegment")))
      .filter($"cum" * 2 >= $"tot")
      .groupBy($"c_mktsegment")
      .agg(min(struct($"c_acctbal", $"c_custkey")).getField("c_acctbal")
          .as("w_median"),
        first($"tot").as("total_w"))
      .orderBy($"c_mktsegment")
  }

  private val q197Sql =
    """WITH wts AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS w
      |  FROM orders GROUP BY o_custkey),
      |vals AS (
      |  SELECT c_mktsegment, c_custkey, c_acctbal, w
      |  FROM customer JOIN wts ON c_custkey = o_custkey),
      |run AS (
      |  SELECT *,
      |    CAST(sum(w) OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal, c_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(w) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS tot
      |  FROM vals)
      |SELECT c_mktsegment, min(c_acctbal) AS w_median, min(tot) AS total_w
      |FROM run WHERE cum * 2 >= tot
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q198

  /** The join-key discovery candidate set: four true FK edges of the
    * TPC-H-ish schema plus one deliberate NON-key pair — the negative
    * control that keeps the classifier honest.
    */
  private case class FkCand(child: String, childCol: String,
      parent: String, parentCol: String)
  private val FkCandidates = Seq(
    FkCand("orders", "o_custkey", "customer", "c_custkey"),
    FkCand("lineitem", "l_partkey", "part", "p_partkey"),
    FkCand("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    FkCand("customer", "c_nationkey", "nation", "n_nationkey"),
    FkCand("orders", "o_orderkey", "customer", "c_custkey"))

  /** q198: join-key discovery — schema profiling that INFERS foreign
    * keys from data: for each candidate (child.col → parent.col) pair,
    * measure value containment (|distinct child ∩ parent| / |distinct
    * child|) and parent-side uniqueness; is_fk ⇔ containment = 1 and
    * the parent column is a key. The auto-join/relationship-detection
    * feature of data catalogs, and the data-driven generalization of
    * q116's declared-FK audit (q116 checks edges you assert; q198
    * finds them). The candidate list includes a deliberate non-key
    * pair as the negative control. Per candidate: two distinct
    * aggregates and a semi-join on DISTINCT key sets — scan-shaped,
    * column-pruned to single columns, trivially parallel across
    * candidates. Ratios compare exact integer counts; the only
    * rounding is presentational.
    */
  def q198FkInference(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = FkCandidates.map { c =>
      val childVals = t(s, dir, c.child)
        .select(col(c.childCol).cast("long").as("v")).distinct()
      val parentCol = t(s, dir, c.parent).select(col(c.parentCol).cast("long").as("p"))
      val parentVals = parentCol.distinct()
      val nChild = childVals.count()
      val nContained = childVals
        .join(parentVals, $"v" === $"p", "left_semi").count()
      val nParentRows = parentCol.count()
      val nParentDistinct = parentVals.count()
      val containment = nContained.toDouble / nChild
      val unique = nParentDistinct == nParentRows
      (s"${c.child}.${c.childCol}", s"${c.parent}.${c.parentCol}",
        nChild, math.rint(containment * 1e6) / 1e6, unique,
        containment == 1.0 && unique)
    }
    per.toDF("child", "parent", "n_child_distinct", "containment",
        "parent_unique", "is_fk")
      .orderBy($"child", $"parent")
  }

  private val q198Sql = {
    val blocks = FkCandidates.map { c =>
      s"""SELECT '${c.child}.${c.childCol}' AS child,
         |  '${c.parent}.${c.parentCol}' AS parent,
         |  (SELECT CAST(count(DISTINCT ${c.childCol}) AS BIGINT) FROM ${c.child})
         |    AS n_child_distinct,
         |  round((SELECT CAST(count(*) AS DOUBLE) FROM
         |      (SELECT DISTINCT ${c.childCol} AS v FROM ${c.child}) cv
         |      WHERE v IN (SELECT ${c.parentCol} FROM ${c.parent}))
         |    / (SELECT count(DISTINCT ${c.childCol}) FROM ${c.child}), 6)
         |    AS containment,
         |  (SELECT count(DISTINCT ${c.parentCol}) = count(*) FROM ${c.parent})
         |    AS parent_unique,
         |  ((SELECT CAST(count(*) AS DOUBLE) FROM
         |      (SELECT DISTINCT ${c.childCol} AS v FROM ${c.child}) cv
         |      WHERE v IN (SELECT ${c.parentCol} FROM ${c.parent}))
         |    = (SELECT count(DISTINCT ${c.childCol}) FROM ${c.child}))
         |   AND (SELECT count(DISTINCT ${c.parentCol}) = count(*) FROM ${c.parent})
         |    AS is_fk""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY child, parent")
  }

  // ---------------------------------------------------------------- q199

  /** q199: Benford first-digit audit — the classic fraud/data-quality
    * screen: the first significant digit of a naturally-spread numeric
    * column should follow log10(1 + 1/d); a synthetic or tampered
    * column fails the chi-square fit (the q77 drift-gauge shape,
    * pointed at digits instead of bins). Digit extraction is
    * INTEGER-exact: prices carry 2 decimals, so the first digit of
    * round(p·100) as a BIGINT's string equals p's first significant
    * digit — no log10-of-double boundary risk, no double formatting
    * divergence. Expected counts round through the q82 decimal
    * discipline before the χ² terms, the per-digit terms DECIMAL-sum
    * into the total, and the df=8 critical-value flag rides every row.
    * One groupBy(digit) shuffle (9 groups) + a 1-row scalar attach.
    */
  def q199Benford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val digits = t(s, dir, "orders")
      .select(substring(round($"o_totalprice" * 100).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum($"n_obs").as("n")) // 1-row scalar attach
    digits.crossJoin(broadcast(tot))
      .withColumn("expected",
        round($"n" * log10(lit(1.0) + lit(1.0) / $"digit"), 6))
      .withColumn("chi_contrib",
        round(($"n_obs" - $"expected") * ($"n_obs" - $"expected") / $"expected", 6))
      .withColumn("chi2", round(sum($"chi_contrib".cast("decimal(20,6)"))
        .over(Window.partitionBy($"n")).cast("double"), 6))
      .select($"digit", $"n_obs", $"expected", $"chi_contrib",
        $"chi2", ($"chi2" > 15.507).as("rejects_benford"))
      .orderBy($"digit")
  }

  private val q199Sql =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
      |  FROM orders),
      |obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
      |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
      |per AS (
      |  SELECT digit, n_obs, n,
      |    round(n * log10(1.0 + 1.0 / digit), 6) AS expected
      |  FROM obs CROSS JOIN tot),
      |chi AS (
      |  SELECT *, round((n_obs - expected) * (n_obs - expected) / expected, 6)
      |    AS chi_contrib
      |  FROM per),
      |wtot AS (
      |  SELECT *, round(CAST(sum(CAST(chi_contrib AS DECIMAL(20,6)))
      |    OVER () AS DOUBLE), 6) AS chi2
      |  FROM chi)
      |SELECT digit, n_obs, expected, chi_contrib, chi2,
      |  chi2 > 15.507 AS rejects_benford
      |FROM wtot ORDER BY digit""".stripMargin

  // ---------------------------------------------------------------- q200

  /** q200: clamped running balance — the inventory/credit-ledger fold
    * B(i) = max(B(i-1) + Δᵢ, 0), which LOOKS sequential (and is why
    * warehouses reach for cursors or per-key UDAFs) but is exactly the
    * Skorokhod reflection: B(i) = S(i) − min(0, min_{j≤i} S(j)) with S
    * the plain running sum. So the whole ledger is TWO window
    * aggregates over one user-keyed sort — no recursion, no state
    * store, no mapGroups; at 100 TB it is a single shuffle on the key
    * with bounded per-row state, and the identity (locked by
    * PlatformSpec against the direct lag-recurrence) is what makes the
    * window form CORRECT, not an approximation. Deltas are
    * integer-exact (round(value) − 50), so every balance is exact
    * integer arithmetic.
    */
  def q200ClampedBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select($"user_id", $"event_id", $"ts",
        (round($"value").cast("long") - 50L).as("delta"))
      .withColumn("s", sum($"delta").over(run))
      .withColumn("floor_adj", least(lit(0L), min($"s").over(run)))
      .select($"user_id", $"event_id", $"delta",
        ($"s" - $"floor_adj").as("bal"))
      .orderBy($"user_id", $"event_id")
  }

  private val q200Sql =
    """WITH d AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(round(value) AS BIGINT) - 50 AS delta
      |  FROM events),
      |r1 AS (
      |  SELECT user_id, event_id, ts, delta,
      |    CAST(sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
      |  FROM d),
      |r2 AS (
      |  SELECT user_id, event_id, delta, s,
      |    least(0, CAST(min(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
      |      AS floor_adj
      |  FROM r1)
      |SELECT user_id, event_id, delta, s - floor_adj AS bal
      |FROM r2 ORDER BY user_id, event_id""".stripMargin

  /** q209 candidate FDs: (lhs expr, rhs expr) over `orders`, chosen to
    * exercise every verdict class — a key-LHS hold, a derived-column
    * hold with a NON-unique LHS (the case uniqueness checks miss), and
    * three fails of different violation densities. Expressions are the
    * engine-shared SQL dialect (split_part/year exist verbatim in both).
    */
  private val FdCandidates: Seq[(String, String)] = Seq(
    ("o_orderkey", "o_custkey"),
    ("o_orderpriority", "split_part(o_orderpriority, '-', 1)"),
    ("o_custkey", "o_orderstatus"),
    ("o_orderstatus", "o_orderpriority"),
    ("year(o_orderdate)", "o_orderstatus"))

  /** q209: functional-dependency discovery — the COLUMN-level
    * profiling twin of q198 (which infers cross-table join keys; this
    * infers within-table determinism "does A fix B", the check behind
    * normalization advice, denormalization safety, and train/serve
    * feature-leak audits). FD A→B holds iff no A-group carries two
    * distinct B values; the query reports exact group counts, the
    * violating-group count, and the maximum per-group B-cardinality
    * for each candidate, so a consumer can distinguish "holds", "holds
    * approximately" and "unrelated" — not just a boolean. The candidate
    * set covers a key-LHS hold, a derived-column hold over a non-unique
    * LHS (uniqueness-based tests cannot see it), and three graded
    * fails. Scale: one shuffle per candidate keyed on its LHS (the
    * TANE-style single-pass per level), all counts exact integers.
    */
  def q209FdDiscovery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
    val per = FdCandidates.map { case (lhs, rhs) =>
      val g = orders.groupBy(expr(lhs).as("l"))
        .agg(count_distinct(expr(rhs)).as("nb"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when($"nb" > 1, 1L).otherwise(0L)).as("n_violating"),
          max($"nb").as("max_rhs_card"))
        .head()
      (lhs, rhs, g.getLong(0), g.getLong(1), g.getLong(2),
        g.getLong(1) == 0L)
    }
    per.toDF("lhs", "rhs", "n_groups", "n_violating", "max_rhs_card", "holds")
      .orderBy($"lhs", $"rhs")
  }

  private val q209Sql = {
    val blocks = FdCandidates.map { case (lhs, rhs) =>
      s"""SELECT '${lhs.replace("'", "''")}' AS lhs,
         |  '${rhs.replace("'", "''")}' AS rhs,
         |  CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violating,
         |  CAST(max(nb) AS BIGINT) AS max_rhs_card,
         |  sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0 AS holds
         |FROM (SELECT $lhs AS l, count(DISTINCT $rhs) AS nb
         |      FROM orders GROUP BY 1)""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY lhs, rhs")
  }

  /** q210 era split: orders strictly before this date are the REFERENCE
    * population (the "training window"), the rest are CURRENT.
    */
  private val PsiSplit = "1998-01-01"

  /** q210: Population Stability Index drift audit — the standard
    * model-monitoring gauge ("did the serving distribution drift off
    * the training distribution") run warehouse-side: o_totalprice's
    * reference-era deciles become fixed bin edges, the current era is
    * binned against them, and PSI = Σ (p_i − q_i)·ln(p_i/q_i)
    * accumulates per bin (industry rule of thumb: < 0.1 stable,
    * > 0.25 shifted). Output is the per-bin audit (counts + term), not
    * just the scalar, so a consumer sees WHERE the mass moved. Exact
    * decile edges come from the q72 ntile device over the REFERENCE
    * half only (documented single-sort baseline; at corpus scale the
    * same cuts come from q68's GK sketch) — then 9 edge scalars pin
    * scan-local binning of the current era: no join, no second
    * shuffle. Laplace +1 smoothing keeps ln defined on empty bins;
    * both engines state the identical formula textually, rounded to 6
    * AFTER the product.
    */
  def q210PsiDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice".as("price"), $"o_orderdate")
    val split = lit(PsiSplit).cast("timestamp")
    val ref = o.filter($"o_orderdate" < split)
    val cur = o.filter($"o_orderdate" >= split)
    val w = Window.orderBy($"price", $"o_orderkey")
    val refCounts = ref.withColumn("decile", ntile(10).over(w))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_ref"), max($"price").as("edge"))
      .persist()
    // 9 boundary scalars: bounded driver assembly (the q198 shape) —
    // binning is then a scan-local comparison chain, shuffle-free
    val edges = refCounts.filter($"decile" <= 9)
      .select($"decile", $"edge").collect()
      .sortBy(_.getInt(0)).map(_.getDouble(1))
    val bin = edges.foldLeft(lit(1)) { (acc, e) =>
      acc + when($"price" > e, 1).otherwise(0)
    }
    val curCounts = cur.select(bin.as("decile"))
      .groupBy($"decile").agg(count(lit(1)).as("n_cur"))
    val nRefTot = ref.count().toDouble
    val nCurTot = cur.count().toDouble
    val p = ($"n_ref" + 1) / lit(nRefTot + 10)
    val q = (coalesce($"n_cur", lit(0L)) + 1) / lit(nCurTot + 10)
    refCounts.join(curCounts, Seq("decile"), "left")
      .select($"decile", $"n_ref",
        coalesce($"n_cur", lit(0L)).as("n_cur"),
        round((p - q) * log(p / q), 6).as("psi_term"))
      .orderBy($"decile")
  }

  private val q210Sql =
    s"""WITH ref AS (
      |  SELECT o_orderkey, o_totalprice AS price FROM orders
      |  WHERE o_orderdate < TIMESTAMP '$PsiSplit'),
      |cur AS (
      |  SELECT o_totalprice AS price FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '$PsiSplit'),
      |rc AS (
      |  SELECT decile, CAST(count(*) AS BIGINT) AS n_ref,
      |    max(price) AS edge
      |  FROM (SELECT price,
      |          ntile(10) OVER (ORDER BY price, o_orderkey) AS decile
      |        FROM ref)
      |  GROUP BY decile),
      |cc AS (
      |  SELECT decile, CAST(count(*) AS BIGINT) AS n_cur FROM (
      |    SELECT 1 + (SELECT count(*) FROM rc e
      |                WHERE e.decile <= 9 AND cur.price > e.edge) AS decile
      |    FROM cur)
      |  GROUP BY decile),
      |tot AS (
      |  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM ref) AS nr,
      |    (SELECT CAST(count(*) AS DOUBLE) FROM cur) AS nc)
      |SELECT rc.decile, rc.n_ref,
      |  coalesce(cc.n_cur, 0) AS n_cur,
      |  round(((rc.n_ref + 1) / (tot.nr + 10)
      |         - (coalesce(cc.n_cur, 0) + 1) / (tot.nc + 10))
      |    * ln(((rc.n_ref + 1) / (tot.nr + 10))
      |         / ((coalesce(cc.n_cur, 0) + 1) / (tot.nc + 10))), 6)
      |    AS psi_term
      |FROM rc LEFT JOIN cc ON rc.decile = cc.decile
      |CROSS JOIN tot
      |ORDER BY rc.decile""".stripMargin

  /** q211: chi-square independence audit between two categorical
    * columns — the third member of the stats-audit family (q199 tests
    * CONFORMANCE to a law, q210 tests DRIFT across eras; this tests
    * ASSOCIATION between columns, the check behind "is this feature
    * informative" and "did a filter introduce selection bias"). One
    * contingency pass over (o_orderstatus × o_orderpriority): observed
    * cell counts, expected = row·col/N from exact integer marginals,
    * per-cell (O−E)²/E contribution rounded to 6 BEFORE anything reads
    * it. Output is the 15-cell table with its marginals — the consumer
    * sums the terms against the df=8 critical value (15.507), exactly
    * the q199 gate's shape. Scale: one groupBy on the cell pair +
    * broadcast marginal attaches; never a second fact scan (marginals
    * re-aggregate from the 15-row cell table).
    */
  def q211Chi2Independence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = t(s, dir, "orders")
      .groupBy($"o_orderstatus".as("status"), $"o_orderpriority".as("prio"))
      .agg(count(lit(1)).as("n_obs"))
      .persist()
    val rowTot = cells.groupBy($"status").agg(sum($"n_obs").as("row_tot"))
    val colTot = cells.groupBy($"prio").agg(sum($"n_obs").as("col_tot"))
    val n = cells.agg(sum($"n_obs").cast("double").as("n"))
    val e = ($"row_tot" * $"col_tot") / $"n"
    cells
      .join(broadcast(rowTot), Seq("status"))
      .join(broadcast(colTot), Seq("prio"))
      .crossJoin(broadcast(n))
      .select($"status", $"prio", $"n_obs", $"row_tot", $"col_tot",
        round(e, 6).as("expected"),
        round(($"n_obs" - e) * ($"n_obs" - e) / e, 6).as("chi2_term"))
      .orderBy($"status", $"prio")
  }

  private val q211Sql =
    """WITH cells AS (
      |  SELECT o_orderstatus AS status, o_orderpriority AS prio,
      |    CAST(count(*) AS BIGINT) AS n_obs
      |  FROM orders GROUP BY 1, 2),
      |rt AS (SELECT status, CAST(sum(n_obs) AS BIGINT) AS row_tot
      |       FROM cells GROUP BY status),
      |ct AS (SELECT prio, CAST(sum(n_obs) AS BIGINT) AS col_tot
      |       FROM cells GROUP BY prio),
      |n AS (SELECT CAST(sum(n_obs) AS DOUBLE) AS n FROM cells)
      |SELECT c.status, c.prio, c.n_obs, rt.row_tot, ct.col_tot,
      |  round((rt.row_tot * ct.col_tot) / n.n, 6) AS expected,
      |  round((c.n_obs - (rt.row_tot * ct.col_tot) / n.n)
      |      * (c.n_obs - (rt.row_tot * ct.col_tot) / n.n)
      |      / ((rt.row_tot * ct.col_tot) / n.n), 6) AS chi2_term
      |FROM cells c
      |JOIN rt ON c.status = rt.status
      |JOIN ct ON c.prio = ct.prio
      |CROSS JOIN n
      |ORDER BY c.status, c.prio""".stripMargin

  // ---------------------------------------------------------------- q212

  /** q212: two-sample Kolmogorov–Smirnov drift test between the q210
    * eras — the NONPARAMETRIC member of the stats-audit family (q199
    * tests conformance to a law, q210 binned drift, q211 association):
    * D = sup over the pooled support of |F_ref(x) − F_cur(x)|, no
    * bins, no distributional assumption. Shape: ONE scan collapses
    * orders to per-price era counts (the only fact-table shuffle);
    * both CDFs then come from [[GlobalRank.withGlobalPrefixSums]]
    * (range partitioning + P-row driver offsets), so the global
    * cumulative sums D needs never funnel through a single-partition
    * window — the difference between a demo KS and one that survives
    * a 100 TB support. Output is one row (ks_d, ks_at, n_ref, n_cur);
    * the argmax location tie-breaks to the smallest price via
    * struct-max.
    */
  def q212KsTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val split = lit(PsiSplit).cast("timestamp")
    val cells = t(s, dir, "orders")
      .groupBy($"o_totalprice".as("v"))
      .agg(sum(when($"o_orderdate" < split, 1L).otherwise(0L)).as("n_ref"),
        sum(when($"o_orderdate" >= split, 1L).otherwise(0L)).as("n_cur"))
      .persist()
    val cum = GlobalRank.withGlobalPrefixSums(
      cells, Seq("n_ref" -> "cr", "n_cur" -> "cc"), $"v".asc)
    val tot = cells.agg(sum($"n_ref").as("tr"), sum($"n_cur").as("tc"))
    cum.crossJoin(broadcast(tot))
      .select($"v",
        round(abs($"cr".cast("double") / $"tr" -
          $"cc".cast("double") / $"tc"), 6).as("gap"),
        $"tr", $"tc")
      .agg(max(struct($"gap", (-$"v").as("negv"))).as("m"),
        max($"tr").as("n_ref"), max($"tc").as("n_cur"))
      .select($"m.gap".as("ks_d"), (-$"m.negv").as("ks_at"),
        $"n_ref", $"n_cur")
  }

  private val q212Sql =
    s"""WITH cells AS (
      |  SELECT o_totalprice AS v,
      |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '$PsiSplit'
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '$PsiSplit'
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
      |             CAST(sum(n_cur) AS BIGINT) AS tc FROM cells),
      |g AS (
      |  SELECT v,
      |    round(abs(CAST(sum(n_ref) OVER (ORDER BY v) AS DOUBLE) / tr
      |            - CAST(sum(n_cur) OVER (ORDER BY v) AS DOUBLE) / tc), 6)
      |      AS gap
      |  FROM cells CROSS JOIN t)
      |SELECT g.gap AS ks_d, g.v AS ks_at, t.tr AS n_ref, t.tc AS n_cur
      |FROM g CROSS JOIN t
      |ORDER BY g.gap DESC, g.v ASC LIMIT 1""".stripMargin

  // ---------------------------------------------------------------- q213

  /** q213: information-gain feature audit — for each candidate
    * categorical feature X, how much knowing X reduces the entropy of
    * the label Y = o_orderstatus: H(Y), H(Y|X), IG = H(Y) − H(Y|X),
    * and the C4.5 gain ratio IG / H(X). This is the decision-tree
    * split criterion run as a column-profiling sweep — "is this
    * feature informative, or a constant, or an overfit key" — the
    * entropy-based counterpart of q211's chi-square association and
    * q209's functional dependencies. ONE scan: each row explodes to
    * its (candidate, value) pairs, one groupBy builds every
    * candidate's contingency cells, and ALL marginals re-aggregate
    * from the cell table (never a second fact scan). Entropy terms
    * round to 12 decimals and sum as DECIMAL(20,12) — the q188 device
    * — so the float sums are associative and engine-exact. Two
    * control candidates pin the scale ends: `constant` (one value —
    * must report IG = 0 and a NULL gain ratio) and `cust_mod16` (a
    * hash bucket of the customer key — informative about nothing,
    * IG ≈ 0 with a real denominator).
    */
  def q213InfoGain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = t(s, dir, "orders")
      .select($"o_orderstatus".as("y"), explode(array(
        struct(lit("constant").as("cand"), lit("all").as("xv")),
        struct(lit("cust_mod16").as("cand"),
          ($"o_custkey" % 16).cast("string").as("xv")),
        struct(lit("priority").as("cand"), $"o_orderpriority".as("xv")),
        struct(lit("year").as("cand"),
          year($"o_orderdate").cast("string").as("xv")))).as("c"))
      .groupBy($"c.cand".as("cand"), $"c.xv".as("xv"), $"y")
      .agg(count(lit(1)).as("nxy"))
      .persist()
    val nx = cells.groupBy($"cand", $"xv").agg(sum($"nxy").as("nx"))
    val ny = cells.groupBy($"cand", $"y").agg(sum($"nxy").as("ny"))
    val nTot = cells.groupBy($"cand").agg(sum($"nxy").as("n"))
    def negEntropy(cnt: Column): Column =
      sum(round((cnt.cast("double") / $"n") * log(cnt.cast("double") / $"n"), 12)
        .cast("decimal(20,12)"))
    val hyx = cells.join(broadcast(nx), Seq("cand", "xv"))
      .join(broadcast(nTot), Seq("cand"))
      .groupBy($"cand")
      .agg(sum(round(($"nxy".cast("double") / $"n") *
          log($"nxy".cast("double") / $"nx"), 12)
        .cast("decimal(20,12)")).as("neg_hyx"))
    val hy = ny.join(broadcast(nTot), Seq("cand"))
      .groupBy($"cand").agg(negEntropy($"ny").as("neg_hy"))
    val hx = nx.join(broadcast(nTot), Seq("cand"))
      .groupBy($"cand")
      .agg(negEntropy($"nx").as("neg_hx"), count(lit(1)).as("n_values"))
    hy.join(hx, Seq("cand")).join(hyx, Seq("cand"))
      .select($"cand", $"n_values",
        round((-$"neg_hy").cast("double"), 6).as("h_y"),
        round((-$"neg_hyx").cast("double"), 6).as("h_y_given_x"),
        round(($"neg_hyx" - $"neg_hy").cast("double"), 6).as("info_gain"),
        when($"neg_hx" < 0,
          round(($"neg_hyx" - $"neg_hy").cast("double") /
            (-$"neg_hx").cast("double"), 6)).as("gain_ratio"))
      .orderBy($"cand")
  }

  private val q213Sql =
    """WITH base AS (
      |  SELECT o_orderstatus AS y, 'constant' AS cand, 'all' AS xv FROM orders
      |  UNION ALL
      |  SELECT o_orderstatus, 'cust_mod16',
      |    CAST(o_custkey % 16 AS VARCHAR) FROM orders
      |  UNION ALL
      |  SELECT o_orderstatus, 'priority', o_orderpriority FROM orders
      |  UNION ALL
      |  SELECT o_orderstatus, 'year',
      |    CAST(year(o_orderdate) AS VARCHAR) FROM orders),
      |cells AS (
      |  SELECT cand, xv, y, CAST(count(*) AS BIGINT) AS nxy
      |  FROM base GROUP BY 1, 2, 3),
      |nx AS (SELECT cand, xv, CAST(sum(nxy) AS BIGINT) AS nx
      |       FROM cells GROUP BY 1, 2),
      |ny AS (SELECT cand, y, CAST(sum(nxy) AS BIGINT) AS ny
      |       FROM cells GROUP BY 1, 2),
      |nt AS (SELECT cand, CAST(sum(nxy) AS BIGINT) AS n
      |       FROM cells GROUP BY 1),
      |hyx AS (
      |  SELECT c.cand,
      |    sum(CAST(round((CAST(c.nxy AS DOUBLE) / nt.n) *
      |        ln(CAST(c.nxy AS DOUBLE) / nx.nx), 12) AS DECIMAL(20,12)))
      |      AS neg_hyx
      |  FROM cells c
      |  JOIN nx ON c.cand = nx.cand AND c.xv = nx.xv
      |  JOIN nt ON c.cand = nt.cand
      |  GROUP BY 1),
      |hy AS (
      |  SELECT ny.cand,
      |    sum(CAST(round((CAST(ny.ny AS DOUBLE) / nt.n) *
      |        ln(CAST(ny.ny AS DOUBLE) / nt.n), 12) AS DECIMAL(20,12)))
      |      AS neg_hy
      |  FROM ny JOIN nt ON ny.cand = nt.cand GROUP BY 1),
      |hx AS (
      |  SELECT nx.cand,
      |    sum(CAST(round((CAST(nx.nx AS DOUBLE) / nt.n) *
      |        ln(CAST(nx.nx AS DOUBLE) / nt.n), 12) AS DECIMAL(20,12)))
      |      AS neg_hx,
      |    CAST(count(*) AS BIGINT) AS n_values
      |  FROM nx JOIN nt ON nx.cand = nt.cand GROUP BY 1)
      |SELECT hy.cand, hx.n_values,
      |  round(CAST(-neg_hy AS DOUBLE), 6) AS h_y,
      |  round(CAST(-neg_hyx AS DOUBLE), 6) AS h_y_given_x,
      |  round(CAST(neg_hyx - neg_hy AS DOUBLE), 6) AS info_gain,
      |  CASE WHEN neg_hx < 0 THEN
      |    round(CAST(neg_hyx - neg_hy AS DOUBLE) /
      |          CAST(-neg_hx AS DOUBLE), 6)
      |  END AS gain_ratio
      |FROM hy
      |JOIN hx ON hy.cand = hx.cand
      |JOIN hyx ON hy.cand = hyx.cand
      |ORDER BY hy.cand""".stripMargin

  // ---------------------------------------------------------------- q214

  /** q214: CUSUM change-point detection over the monthly revenue
    * series — where did the level of a time series shift? S_t =
    * Σ_{i≤t}(x_i − x̄) peaks (in absolute value) at the change point;
    * the month of the peak is flagged. Arithmetic is integer-exact to
    * the end: revenues aggregate as DECIMAL cents into longs, and
    * S_t = ccum_t − t·total/M is computed from longs with ONE double
    * division — no float accumulation anywhere. Shape: one scan
    * collapses orders to the month table; the running sums (and the
    * month index t itself — a prefix sum of ones) come from
    * [[GlobalRank.withGlobalPrefixSums]], so the device holds even
    * for a per-second series with billions of points; the mean and
    * the peak are 1-row broadcast scalar attaches. Output: the full
    * (month, revenue, s_t) series with the change point flagged —
    * tie-break earliest month.
    */
  def q214CusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = t(s, dir, "orders")
      .groupBy(date_trunc("month", $"o_orderdate").as("m"))
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("revd"))
      .select($"m", ($"revd" * 100).cast("long").as("cents"),
        lit(1L).as("one"))
      .persist()
    val cum = GlobalRank.withGlobalPrefixSums(
      monthly, Seq("cents" -> "ccum", "one" -> "t"), $"m".asc)
    val tot = monthly.agg(sum($"cents").as("tc"), sum($"one").as("mm"))
    val g = cum.crossJoin(broadcast(tot))
      .select($"m", ($"cents" / lit(100.0)).as("revenue"), $"t",
        round(($"ccum".cast("double") -
          $"t".cast("double") * $"tc" / $"mm") / 100.0, 6).as("s_t"))
    val peak = g.agg(
      max(struct(abs($"s_t").as("a"), (-$"t").as("negt"))).as("p"))
    g.crossJoin(broadcast(peak))
      .select($"m", $"revenue", $"s_t",
        ($"t" === -$"p.negt").as("is_changepoint"))
      .orderBy($"m")
  }

  private val q214Sql =
    """WITH mo AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |c AS (
      |  SELECT m, cents,
      |    CAST(sum(cents) OVER (ORDER BY m) AS BIGINT) AS ccum,
      |    CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t
      |  FROM mo),
      |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS tc,
      |               CAST(count(*) AS BIGINT) AS mm FROM mo),
      |g AS (
      |  SELECT m, cents / 100.0 AS revenue, t,
      |    round((CAST(ccum AS DOUBLE) -
      |           CAST(t AS DOUBLE) * tc / mm) / 100.0, 6) AS s_t
      |  FROM c CROSS JOIN tot),
      |pk AS (SELECT t AS pt FROM g ORDER BY abs(s_t) DESC, m ASC LIMIT 1)
      |SELECT m, revenue, s_t, t = pt AS is_changepoint
      |FROM g CROSS JOIN pk ORDER BY m""".stripMargin

  // ---------------------------------------------------------------- q223

  /** q223: linear-time MMD² two-sample test over the EMBEDDING
    * distribution — the multivariate member of the drift family. PSI
    * (q210) and KS (q212) gauge one feature at a time and q173 gauges
    * drift against a trained codebook; MMD (Gretton et al., JMLR 2012)
    * tests the joint distribution directly with no training and no
    * binning. The full U-statistic is O(n²); the linear-time estimator
    * pairs consecutive samples — h(t) = k(x₁,x₂)+k(y₁,y₂)−k(x₁,y₂)
    * −k(x₂,y₁) over disjoint quadruples, mean(h) estimates MMD² — and
    * is the only form that runs at 100 TB: a scan-shaped pass whose
    * shuffles carry (t, 64-long) rows keyed by the pairing index, never
    * a pairwise matrix. Two arms make the gauge self-calibrating: the
    * even/odd split of one corpus (truth ≈ 0) and the same split with
    * the odd side's first coordinate shifted (truth > 0). Kernel is
    * quadratic-polynomial on 1e-6-quantized longs — dot products are
    * exact in both engines' arithmetic (≤6.4e13 < 2⁵³), each h is one
    * fixed 4-term float expression rounded at 6 and summed as
    * DECIMAL(18,6), so the mean is order-independent and engine-exact
    * (the q222 device). RBF would need exp(); the polynomial kernel
    * keeps the characteristic-enough geometry AND cross-engine
    * determinism.
    */
  def q223MmdDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vq = t(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding",
        x => floor(x.cast("double") * 1000000).cast("long")).as("vq"))
    // dense vec_ids: even ids are sample X, odd ids sample Y, and the
    // pairing index is plain arithmetic — no global-order window.
    val X = vq.filter($"vec_id" % 2 === 0)
      .select(($"vec_id" / 2).cast("long").as("r"), $"vq")
    val Y0 = vq.filter($"vec_id" % 2 === 1)
      .select((($"vec_id" - 1) / 2).cast("long").as("r"), $"vq")
    def dotq(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, z) => acc + z)
    def kpoly(a: Column, b: Column): Column = {
      val dd = lit(1.0) + dotq(a, b).cast("double") / lit(1.0e12)
      dd * dd
    }
    def arm(label: String, y: DataFrame): DataFrame = {
      def slot(df: DataFrame, sl: Int, out: String) =
        df.filter($"r" % 2 === sl)
          .select(($"r" / 2).cast("long").as("t"), $"vq".as(out))
      val h = slot(X, 0, "x1").join(slot(X, 1, "x2"), "t")
        .join(slot(y, 0, "y1"), "t").join(slot(y, 1, "y2"), "t")
        .select(
          round(kpoly($"x1", $"x2") + kpoly($"y1", $"y2")
            - kpoly($"x1", $"y2") - kpoly($"x2", $"y1"), 6)
            .cast("decimal(18,6)").as("h"))
      h.agg(count(lit(1)).as("n_pairs"),
        round(sum($"h").cast("double") / count(lit(1)), 6).as("mmd2"))
        .select(lit(label).as("arm"), $"n_pairs", $"mmd2")
    }
    val shifted = Y0.select($"r",
      concat(array(element_at($"vq", 1) + lit(1000000L)),
        slice($"vq", 2, 63)).as("vq"))
    arm("same", Y0).unionAll(arm("shifted", shifted)).orderBy($"arm")
  }

  private val q223Sql = {
    def k(a: String, b: String) =
      s"(1.0 + list_dot_product($a.vq, $b.vq) / 1.0e12) * " +
        s"(1.0 + list_dot_product($a.vq, $b.vq) / 1.0e12)"
    def armSql(label: String, ytab: String) =
      s"""SELECT '$label' AS arm, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(sum(h) AS DOUBLE) / count(*), 6) AS mmd2
        |FROM (
        |  SELECT CAST(round(${k("x1", "x2")} + ${k("y1", "y2")}
        |      - ${k("x1", "y2")} - ${k("x2", "y1")}, 6)
        |    AS DECIMAL(18,6)) AS h
        |  FROM (SELECT r // 2 AS t, vq FROM x WHERE r % 2 = 0) x1
        |  JOIN (SELECT r // 2 AS t, vq FROM x WHERE r % 2 = 1) x2 USING (t)
        |  JOIN (SELECT r // 2 AS t, vq FROM $ytab WHERE r % 2 = 0) y1 USING (t)
        |  JOIN (SELECT r // 2 AS t, vq FROM $ytab WHERE r % 2 = 1) y2 USING (t))""".stripMargin
    s"""WITH vq AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    v -> CAST(floor(v * 1000000) AS BIGINT)) AS vq
      |  FROM embeddings),
      |x AS (SELECT vec_id // 2 AS r, vq FROM vq WHERE vec_id % 2 = 0),
      |y AS (SELECT (vec_id - 1) // 2 AS r, vq FROM vq WHERE vec_id % 2 = 1),
      |ys AS (SELECT r, list_concat([vq[1] + 1000000], vq[2:64]) AS vq FROM y)
      |${armSql("same", "y")}
      |UNION ALL
      |${armSql("shifted", "ys")}
      |ORDER BY arm""".stripMargin
  }

  // ---------------------------------------------------------------- q230

  /** q230: RENDEZVOUS (highest-random-weight) SHARDING and the cost of
    * rebalancing — the shard-assignment discipline a 100 TB corpus
    * needs when the shard count changes: naive `key mod S` reassigns
    * ~(1−1/S′) ≈ 94% of every shard on S=16 → S′=17, while rendezvous
    * hashing (Thaler–Ravishankar) moves EXACTLY the keys whose new
    * shard's hash beats all incumbents — 1/17 in expectation — with no
    * ring state at all: shard(k) = argmax_s h(k,s), a pure scan-shaped
    * O(n·S) projection that any executor computes independently. The
    * query assigns every document under 16 and 17 shards, reports
    * per-shard sizes and moved counts, and a `__total` row comparing
    * rendezvous churn against the mod-hash churn on the same keys.
    * Hashes are the 52-bit md5 device; argmax is a struct-max (h, s)
    * aggregate, partial-aggregated map-side — no window, no join, one
    * doc-keyed shuffle of 17-row groups.
    */
  def q230RendezvousSharding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asg = t(s, dir, "documents").select($"doc_id")
      .select($"doc_id", explode(sequence(lit(0), lit(16))).as("sh"))
      .withColumn("h",
        conv(substring(md5(concat($"doc_id".cast("string"), lit(":"),
          $"sh".cast("string"))), 1, 13), 16, 10).cast("long"))
      .groupBy($"doc_id")
      .agg(
        max(when($"sh" < 16, struct($"h", $"sh"))).getField("sh").as("s16"),
        max(struct($"h", $"sh")).getField("sh").as("s17"))
      .withColumn("mod_moved",
        pmod($"doc_id", lit(16)) =!= pmod($"doc_id", lit(17)))
    val perShard = asg.groupBy($"s16".as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"s16" =!= $"s17", 1L).otherwise(0L)).as("n_moved"))
      .withColumn("churn", round($"n_moved".cast("double") / $"n_docs", 4))
      .withColumn("mod_churn", lit(null).cast("double"))
    val total = asg.agg(count(lit(1)).as("n_docs"),
        sum(when($"s16" =!= $"s17", 1L).otherwise(0L)).as("n_moved"),
        sum(when($"mod_moved", 1L).otherwise(0L)).as("n_mod_moved"))
      .select(lit(-1).as("shard"), $"n_docs", $"n_moved",
        round($"n_moved".cast("double") / $"n_docs", 4).as("churn"),
        round($"n_mod_moved".cast("double") / $"n_docs", 4).as("mod_churn"))
    perShard.unionByName(total).orderBy($"shard")
  }

  private val q230Sql =
    """WITH ex AS (
      |  SELECT doc_id, sh.sh AS sh,
      |    ('0x' || substr(md5(doc_id || ':' || sh.sh), 1, 13))::BIGINT AS h
      |  FROM documents
      |  CROSS JOIN (SELECT unnest(range(0, 17)) AS sh) sh),
      |r16 AS (
      |  SELECT doc_id, sh AS s16 FROM (
      |    SELECT doc_id, sh,
      |      row_number() OVER (PARTITION BY doc_id
      |        ORDER BY h DESC, sh DESC) AS rn
      |    FROM ex WHERE sh < 16) WHERE rn = 1),
      |r17 AS (
      |  SELECT doc_id, sh AS s17 FROM (
      |    SELECT doc_id, sh,
      |      row_number() OVER (PARTITION BY doc_id
      |        ORDER BY h DESC, sh DESC) AS rn
      |    FROM ex) WHERE rn = 1),
      |asg AS (
      |  SELECT r16.doc_id, s16, s17,
      |    (r16.doc_id % 16) <> (r16.doc_id % 17) AS mod_moved
      |  FROM r16 JOIN r17 ON r16.doc_id = r17.doc_id)
      |SELECT CAST(s16 AS INTEGER) AS shard,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_moved,
      |  round(CAST(sum(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 4) AS churn,
      |  CAST(NULL AS DOUBLE) AS mod_churn
      |FROM asg GROUP BY s16
      |UNION ALL
      |SELECT -1, CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS BIGINT),
      |  round(CAST(sum(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 4),
      |  round(CAST(sum(CASE WHEN mod_moved THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 4)
      |FROM asg
      |ORDER BY shard""".stripMargin

  /** Bottom-up column provenance over an ANALYZED logical plan: every
    * attribute's exprId maps to the set of (table, column) leaves it
    * derives from. Leaves are parquet LogicalRelations (table = path
    * basename); Alias-introducing nodes (Project / Aggregate / Window)
    * union the provenance of their child expressions' references;
    * Filter/Join/Sort/SubqueryAlias preserve attribute identity so
    * they need no rule at all. This is the engine-introspection half
    * of the governance surface (q196 masks columns; this AUDITS where
    * they flow) — the analyzed plan, not the optimized one, so the
    * lineage is stable under optimizer evolution.
    */
  private[graft] def columnLineage(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Map[Long, Set[(String, String)]] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project, Window => WinNode}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val m = scala.collection.mutable.Map.empty[Long, Set[(String, String)]]
    def refsOf(e: Expression): Set[(String, String)] =
      e.references.toSeq.flatMap(a => m.getOrElse(a.exprId.id, Set.empty)).toSet
    plan.foreachUp {
      case lr: LogicalRelation =>
        val table = lr.relation match {
          case h: HadoopFsRelation => h.location.rootPaths.headOption
            .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
          case _ => "?"
        }
        lr.output.foreach(a => m(a.exprId.id) = Set((table, a.name)))
      case p: Project =>
        p.projectList.foreach {
          case al: Alias => m(al.exprId.id) = refsOf(al.child)
          case _ => ()
        }
      case ag: Aggregate =>
        ag.aggregateExpressions.foreach {
          case al: Alias => m(al.exprId.id) = refsOf(al.child)
          case _ => ()
        }
      case w: WinNode =>
        w.windowExpressions.foreach {
          case al: Alias => m(al.exprId.id) = refsOf(al.child)
          case _ => ()
        }
      case _ => ()
    }
    m.toMap
  }

  /** q252: COLUMN-LEVEL LINEAGE of q02's star join — extracted FROM THE
    * ENGINE (the analyzed plan), verified against the hand-derived
    * truth in the oracle. Constant-only outputs (count(*)) report the
    * `(constant)` sentinel. This is the data-catalog feed every
    * governed platform builds; doing it by plan walk means it can
    * never drift from what the query actually computes — unlike
    * documentation.
    */
  def q252ColumnLineage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = Relational.q02RevenueByNation(s, dir)
    val plan = df.queryExecution.analyzed
    val prov = columnLineage(plan)
    val rows = plan.output.flatMap { a =>
      val srcs = prov.getOrElse(a.exprId.id, Set.empty[(String, String)])
      if (srcs.isEmpty) Seq((a.name, "(constant)", "(constant)"))
      else srcs.toSeq.sorted.map { case (tb, c) => (a.name, tb, c) }
    }
    rows.toDF("output_column", "source_table", "source_column")
      .orderBy($"output_column", $"source_table", $"source_column")
  }

  private val q252Sql =
    """SELECT * FROM (VALUES
      |  ('n_customers', 'orders', 'o_custkey'),
      |  ('n_name', 'nation', 'n_name'),
      |  ('n_orders', '(constant)', '(constant)'),
      |  ('revenue', 'orders', 'o_totalprice'))
      |  AS t(output_column, source_table, source_column)
      |ORDER BY output_column, source_table, source_column""".stripMargin

  private val BootReps = 32

  /** q264: POISSON BOOTSTRAP confidence interval — THE distributed
    * resampling device (Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams"): classical bootstrap resamples n rows with
    * replacement R times (un-shardable — every replicate needs global
    * coordination), the Poisson approximation gives each row an
    * independent Poisson(1) multiplicity PER REPLICATE, which is one
    * scan-local projection: explode 32 replicate ids, hash-derive the
    * weight by inverting the Poisson(1) CDF on the md5 unit line (the
    * q254 hex-threshold coin — no RNG, reruns reproduce the sample),
    * and aggregate 32 weighted means in ONE map-side-combining groupBy.
    * CI = nearest-rank p05/p95 over the 32-row replicate table (rank 2
    * and 31); SE from decimal-exact Σm/Σm². The replicate means stay
    * hash-exact across engines because each is a single division of a
    * DECIMAL-exact weighted sum by an integer weight total.
    */
  def q264PoissonBootstrap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    // Poisson(1) CDF as md5-hex thresholds: P(k<=0)=0.36788 -> 0x5e2d58d8,
    // cumulative through k=6; the else-arm pools the 1e-5 tail at 7
    val w = {
      val h = $"h"
      when(h < "5e2d58d8", 0L).when(h < "bc5ab1b1", 1L)
        .when(h < "eb715e1d", 2L).when(h < "fb239797", 3L)
        .when(h < "ff1025f5", 4L).when(h < "ffd90f3b", 5L)
        .when(h < "fffa8b71", 6L).otherwise(7L)
    }
    // r14 optimization: the orders table arrives as one row group, so
    // the whole explode(x8) -> md5 -> explode(x4) -> weight chain ran on
    // ONE task (guide: input skew / spread CPU-bound per-row work).
    // loadSpread unlocks the other cores; every downstream sum is exact
    // DECIMAL/long, so placement cannot change a bit of the output.
    // Measured sf0.1: 3.19 s -> 0.95 s median.
    val reps = Tables.loadSpread(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice".cast(dec).as("x"),
        explode(sequence(lit(0), lit(BootReps / 4 - 1))).as("blk"))
      // one md5 per 4-REPLICATE block: the digest's 32 hex digits carry
      // four independent 8-hex unit-line coins (lane = rep % 4). Round
      // 12: the digest is computed on the BLOCK row and the lanes
      // explode AFTER it — the earlier rep-first explode re-evaluated
      // the identical md5 on all four lane rows (projection expressions
      // don't CSE across generated rows), 4.8M hashes instead of 1.2M
      // at sf0.1. Values are bit-identical: h(rep) still reads lane
      // rep%4 of digest(bs:⌊rep/4⌋:key).
      .withColumn("hh", md5(concat(lit("bs:"), $"blk".cast("string"),
        lit(":"), $"o_orderkey".cast("string"))))
      .select($"o_orderkey", $"x", $"blk", $"hh",
        explode(sequence(lit(0), lit(3))).as("lane"))
      .select($"o_orderkey", $"x", ($"blk" * 4 + $"lane").as("rep"),
        $"hh".substr($"lane" * 8 + 1, lit(8)).as("h"))
      .withColumn("w", w)
      .groupBy($"rep")
      .agg(sum($"w").as("n"), sum($"x" * $"w").as("sx"))
      .select($"rep",
        // double division of two exact values — decimal/bigint division
        // scale rules differ between engines, double division does not
        round($"sx".cast("double") / $"n".cast("double"), 8).as("m"))
    val wRank = Window.orderBy($"m".asc, $"rep".asc)
    val ranked = reps.withColumn("rk", row_number().over(wRank))
    val ci = ranked.agg(
      min(when($"rk" === 2, $"m")).as("boot_p05"),
      max(when($"rk" === BootReps - 1, $"m")).as("boot_p95"),
      sum($"m".cast(org.apache.spark.sql.types.DecimalType(20, 8))).as("sm"),
      sum(($"m" * $"m").cast(org.apache.spark.sql.types.DecimalType(30, 10)))
        .as("sm2"))
    val point = t(s, dir, "orders").agg(
      count(lit(1)).as("n_orders"),
      sum($"o_totalprice".cast(dec)).as("tot"))
    val pm = round($"tot".cast("double") / $"n_orders".cast("double"), 8)
    point.crossJoin(ci).select(
      $"n_orders",
      pm.as("point_mean"),
      $"boot_p05", $"boot_p95",
      round(sqrt(($"sm2".cast("double") -
          $"sm".cast("double") * $"sm".cast("double") / BootReps) /
        (BootReps - 1)), 6).as("boot_se"),
      ($"boot_p05" <= pm && pm <= $"boot_p95").as("ci_covers_point"))
  }

  private val q264Sql =
    s"""WITH reps AS (
       |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS x,
       |    g.rep,
       |    substr(md5('bs:' || (g.rep // 4) || ':' || o_orderkey),
       |      CAST(g.rep % 4 AS INTEGER) * 8 + 1, 8) AS h
       |  FROM orders CROSS JOIN (
       |    SELECT unnest(range(0, $BootReps)) AS rep) g),
       |ms AS (
       |  SELECT rep,
       |    round(CAST(sum(CAST(x AS DECIMAL(18,2)) * w) AS DOUBLE) /
       |      CAST(sum(w) AS DOUBLE), 8) AS m
       |  FROM (
       |    SELECT rep, x,
       |      CASE WHEN h < '5e2d58d8' THEN 0 WHEN h < 'bc5ab1b1' THEN 1
       |        WHEN h < 'eb715e1d' THEN 2 WHEN h < 'fb239797' THEN 3
       |        WHEN h < 'ff1025f5' THEN 4 WHEN h < 'ffd90f3b' THEN 5
       |        WHEN h < 'fffa8b71' THEN 6 ELSE 7 END AS w
       |    FROM reps)
       |  GROUP BY rep),
       |ranked AS (
       |  SELECT m, row_number() OVER (ORDER BY m ASC, rep ASC) AS rk
       |  FROM ms),
       |ci AS (
       |  SELECT min(CASE WHEN rk = 2 THEN m END) AS boot_p05,
       |    max(CASE WHEN rk = ${BootReps - 1} THEN m END) AS boot_p95,
       |    sum(CAST(m AS DECIMAL(20,8))) AS sm,
       |    sum(CAST(m * m AS DECIMAL(30,10))) AS sm2
       |  FROM ranked),
       |pt AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_orders,
       |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
       |  FROM orders)
       |SELECT n_orders,
       |  round(CAST(tot AS DOUBLE) / CAST(n_orders AS DOUBLE), 8)
       |    AS point_mean,
       |  boot_p05, boot_p95,
       |  round(sqrt((CAST(sm2 AS DOUBLE) -
       |      CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / $BootReps) /
       |    ${BootReps - 1}), 6) AS boot_se,
       |  boot_p05 <= round(CAST(tot AS DOUBLE) / CAST(n_orders AS DOUBLE), 8)
       |    AND round(CAST(tot AS DOUBLE) / CAST(n_orders AS DOUBLE), 8)
       |      <= boot_p95
       |    AS ci_covers_point
       |FROM pt CROSS JOIN ci""".stripMargin

  /** q265: GINI + HHI REVENUE-CONCENTRATION per nation — the
    * inequality/market-power audit (who owns the revenue mass, and is
    * a segment one-customer fragile?). Per-customer revenue aggregates
    * first (one fact shuffle), ranks and sums run PARTITIONED BY
    * NATION (never a global sort), and both coefficients come from
    * exact-DECIMAL sufficient statistics: Gini by the rank formula
    * G = (2·Σi·x_i − (n+1)·Σx)/(n·Σx) with a total order (rev asc,
    * custkey asc) so tie handling is engine-identical, HHI = Σx²/(Σx)²
    * — one double division each at the very end, round(6)-pinned.
    * Customers with no orders count at revenue 0 (they ARE part of the
    * inequality picture).
    */
  def q265GiniConcentration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val rev = t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast(dec)).as("rev"))
    val cust = t(s, dir, "customer")
      .join(rev, $"c_custkey" === $"o_custkey", "left")
      .join(broadcast(t(s, dir, "nation")),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_custkey",
        coalesce($"rev", lit(0).cast(dec)).as("rev"))
    val wN = Window.partitionBy($"n_name")
      .orderBy($"rev".asc, $"c_custkey".asc)
    val stats = cust.withColumn("i", row_number().over(wN).cast("long"))
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"),
        sum($"rev").as("tot"),
        sum($"rev" * $"i").as("sir"),
        sum(($"rev" * $"rev")
          .cast(org.apache.spark.sql.types.DecimalType(38, 4))).as("s2"))
    stats.select($"n_name", $"n_customers",
      round($"tot".cast("double"), 2).as("total_revenue"),
      round((lit(2.0) * $"sir".cast("double") -
          ($"n_customers" + 1).cast("double") * $"tot".cast("double")) /
        ($"n_customers".cast("double") * $"tot".cast("double")), 6)
        .as("gini"),
      round($"s2".cast("double") /
        ($"tot".cast("double") * $"tot".cast("double")), 6).as("hhi"))
      .orderBy($"n_name")
  }

  private val q265Sql =
    """WITH rev AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |cust AS (
      |  SELECT n.n_name, c.c_custkey,
      |    coalesce(r.rev, CAST(0 AS DECIMAL(18,2))) AS rev
      |  FROM customer c
      |  LEFT JOIN rev r ON c.c_custkey = r.o_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
      |ranked AS (
      |  SELECT n_name, rev,
      |    CAST(row_number() OVER (PARTITION BY n_name
      |      ORDER BY rev ASC, c_custkey ASC) AS BIGINT) AS i
      |  FROM cust),
      |stats AS (
      |  SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
      |    sum(rev) AS tot, sum(rev * i) AS sir,
      |    sum(CAST(rev * rev AS DECIMAL(38,4))) AS s2
      |  FROM ranked GROUP BY 1)
      |SELECT n_name, n_customers,
      |  round(CAST(tot AS DOUBLE), 2) AS total_revenue,
      |  round((2e0 * CAST(sir AS DOUBLE) -
      |      CAST(n_customers + 1 AS DOUBLE) * CAST(tot AS DOUBLE)) /
      |    (CAST(n_customers AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS gini,
      |  round(CAST(s2 AS DOUBLE) /
      |    (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi
      |FROM stats
      |ORDER BY n_name""".stripMargin

  /** q266: ISOTONIC CALIBRATION FIT (PAVA by minimax) — q153 AUDITS a
    * score's reliability table; this query FITS the monotone
    * calibration map production scorers actually deploy (isotonic
    * regression is the standard post-hoc calibrator next to Platt).
    * The scalable form: pool sufficient statistics per score bin first
    * (the XGBoost-histogram move — the fact table is touched once, the
    * fit runs on the ~11-row bin table), then the exact PAVA solution
    * via its minimax characterization f(i) = max_{j<=i} min_{k>=i}
    * avg(y over bins j..k): interval averages from a bounded non-equi
    * self-product of the bin table (|B|³ ≈ 1.3k rows at any corpus
    * size), no iteration, no driver loop. Rates are one
    * exact-int division each, round(8)-pinned before the minimax so
    * min/max compare identical doubles in both engines.
    */
  def q266IsotonicCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bins = t(s, dir, "lineitem")
      .select(floor($"l_discount" * 100).cast("long").as("bin"),
        when($"l_returnflag" === "R", 1L).otherwise(0L).as("bad"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"bad").as("b"))
      .persist()
    val ids = bins.select($"bin")
    val jk = ids.select($"bin".as("j"))
      .crossJoin(ids.select($"bin".as("k")))
      .filter($"j" <= $"k")
    val ivals = jk.join(bins, $"bin" >= $"j" && $"bin" <= $"k")
      .groupBy($"j", $"k")
      .agg(round(sum($"b").cast("double") / sum($"n").cast("double"), 8)
        .as("rate"))
    val iso = ids.select($"bin".as("i"))
      .join(ivals, $"j" <= $"i" && $"i" <= $"k")
      .groupBy($"i", $"j").agg(min($"rate").as("mn"))
      .groupBy($"i").agg(max($"mn").as("iso_rate"))
    val out = bins.join(iso, $"bin" === $"i")
      .select($"bin", $"n", $"b".as("bad"),
        round($"b".cast("double") / $"n".cast("double"), 8).as("raw_rate"),
        $"iso_rate")
      .orderBy($"bin")
      .localCheckpoint()
    bins.unpersist()
    out
  }

  private val q266Sql =
    """WITH bins AS (
      |  SELECT CAST(floor(l_discount * 100) AS BIGINT) AS bin,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b
      |  FROM lineitem GROUP BY 1),
      |ivals AS (
      |  SELECT j.bin AS j, k.bin AS k,
      |    round(CAST(sum(m.b) AS DOUBLE) / CAST(sum(m.n) AS DOUBLE), 8)
      |      AS rate
      |  FROM bins j CROSS JOIN bins k JOIN bins m
      |    ON m.bin >= j.bin AND m.bin <= k.bin
      |  WHERE j.bin <= k.bin
      |  GROUP BY 1, 2),
      |iso AS (
      |  SELECT i, max(mn) AS iso_rate FROM (
      |    SELECT b.bin AS i, v.j, min(v.rate) AS mn
      |    FROM bins b JOIN ivals v ON v.j <= b.bin AND b.bin <= v.k
      |    GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT b.bin, b.n, b.b AS bad,
      |  round(CAST(b.b AS DOUBLE) / CAST(b.n AS DOUBLE), 8) AS raw_rate,
      |  iso.iso_rate
      |FROM bins b JOIN iso ON b.bin = iso.i
      |ORDER BY b.bin""".stripMargin

  /** q268: CUPED variance reduction (Deng et al. 2013) — the A/B-test
    * sensitivity booster every experimentation platform ships: adjust
    * each unit's metric by its PRE-EXPERIMENT covariate, Y' = Y −
    * θ(X − X̄) with θ = cov(X,Y)/var(X), shrinking metric variance by
    * the factor (1 − ρ²) without biasing any group contrast. Units are
    * customers, X = 1995–96 revenue, Y = 1997 revenue (zero-filled —
    * silent dropouts are exactly what CUPED must keep). One scan
    * builds per-customer (x, y); θ and ρ² come from DECIMAL-exact
    * global sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²); the
    * per-segment adjusted mean needs NO second pass — it collapses to
    * ȳ_s − θ(x̄_s − x̄), all from per-segment exact sums. Doubles
    * appear only in the final fixed-shape arithmetic, round(6)-pinned.
    */
  def q268Cuped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val dec2 = org.apache.spark.sql.types.DecimalType(38, 4)
    val xy = t(s, dir, "orders")
      .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp_ntz"))
      .groupBy($"o_custkey")
      .agg(
        sum(when($"o_orderdate" < lit("1997-01-01").cast("timestamp_ntz"),
          $"o_totalprice".cast(dec)).otherwise(lit(0).cast(dec))).as("x"),
        sum(when($"o_orderdate" >= lit("1997-01-01").cast("timestamp_ntz"),
          $"o_totalprice".cast(dec)).otherwise(lit(0).cast(dec))).as("y"))
    val cust = t(s, dir, "customer")
      .join(xy, $"c_custkey" === $"o_custkey", "left")
      .select($"c_mktsegment",
        coalesce($"x", lit(0).cast(dec)).as("x"),
        coalesce($"y", lit(0).cast(dec)).as("y"))
      .persist()
    val g = cust.agg(count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum(($"x" * $"y").cast(dec2)).as("sxy"),
      sum(($"x" * $"x").cast(dec2)).as("sx2"),
      sum(($"y" * $"y").cast(dec2)).as("sy2"))
    val seg = cust.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("ns"),
        sum($"x").as("ssx"), sum($"y").as("ssy"))
    val n = $"n".cast("double")
    val (sx, sy, sxy, sx2, sy2) = ($"sx".cast("double"), $"sy".cast("double"),
      $"sxy".cast("double"), $"sx2".cast("double"), $"sy2".cast("double"))
    val covxy = sxy - sx * sy / n
    val varx = sx2 - sx * sx / n
    val vary = sy2 - sy * sy / n
    val theta = covxy / varx
    val xbar = sx / n
    val out = seg.crossJoin(broadcast(g)).select(
      $"c_mktsegment",
      $"ns".as("n_customers"),
      round($"ssy".cast("double") / $"ns".cast("double"), 6).as("raw_mean"),
      round($"ssy".cast("double") / $"ns".cast("double") -
        theta * ($"ssx".cast("double") / $"ns".cast("double") - xbar), 6)
        .as("cuped_mean"),
      round(theta, 6).as("theta"),
      round(lit(1.0) - (covxy * covxy) / (varx * vary), 6)
        .as("var_ratio"))
      .orderBy($"c_mktsegment")
      .localCheckpoint()
    cust.unpersist()
    out
  }

  private val q268Sql =
    """WITH xy AS (
      |  SELECT o_custkey,
      |    sum(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
      |      THEN CAST(o_totalprice AS DECIMAL(18,2))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
      |    sum(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
      |      THEN CAST(o_totalprice AS DECIMAL(18,2))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1),
      |cust AS (
      |  SELECT c.c_mktsegment,
      |    coalesce(xy.x, CAST(0 AS DECIMAL(18,2))) AS x,
      |    coalesce(xy.y, CAST(0 AS DECIMAL(18,2))) AS y
      |  FROM customer c LEFT JOIN xy ON c.c_custkey = xy.o_custkey),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(CAST(x * y AS DECIMAL(38,4))) AS sxy,
      |    sum(CAST(x * x AS DECIMAL(38,4))) AS sx2,
      |    sum(CAST(y * y AS DECIMAL(38,4))) AS sy2
      |  FROM cust),
      |seg AS (
      |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS ns,
      |    sum(x) AS ssx, sum(y) AS ssy
      |  FROM cust GROUP BY 1)
      |SELECT c_mktsegment, ns AS n_customers,
      |  round(CAST(ssy AS DOUBLE) / CAST(ns AS DOUBLE), 6) AS raw_mean,
      |  round(CAST(ssy AS DOUBLE) / CAST(ns AS DOUBLE) -
      |    ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) /
      |        CAST(n AS DOUBLE)) /
      |     (CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
      |        CAST(n AS DOUBLE))) *
      |    (CAST(ssx AS DOUBLE) / CAST(ns AS DOUBLE) -
      |     CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cuped_mean,
      |  round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) /
      |      CAST(n AS DOUBLE)) /
      |    (CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
      |      CAST(n AS DOUBLE)), 6) AS theta,
      |  round(1e0 -
      |    ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) /
      |        CAST(n AS DOUBLE)) *
      |     (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) /
      |        CAST(n AS DOUBLE))) /
      |    ((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
      |        CAST(n AS DOUBLE)) *
      |     (CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) /
      |        CAST(n AS DOUBLE))), 6) AS var_ratio
      |FROM seg CROSS JOIN g
      |ORDER BY c_mktsegment""".stripMargin

  /** q269: DIFFERENCE-IN-DIFFERENCES — the 2×2 panel estimator
    * (Card & Krueger shape): effect = (treated post − treated pre) −
    * (control post − control pre), which cancels both the group fixed
    * effect and the common time trend. Treated = BUILDING-segment
    * customers, cut at 1998-01-01. The whole estimator reduces to four
    * cell means plus a pooled SE — one order-level scan into a 4-row
    * (treat, post) cell table of DECIMAL-exact (n, Σy, Σy²), then a
    * single-row assembly via conditional extraction (no windows, no
    * cross joins — min(CASE) over 4 rows). SE is the unpooled Welch
    * form √(Σ s²_cell/n_cell); doubles enter only in the final fixed
    * expression, round(6)-pinned.
    */
  def q269DiffInDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val dec2 = org.apache.spark.sql.types.DecimalType(38, 4)
    val cells = t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select(($"c_mktsegment" === "BUILDING").as("treat"),
        ($"o_orderdate" >= lit("1998-01-01").cast("timestamp_ntz"))
          .as("post"),
        $"o_totalprice".cast(dec).as("y"))
      .groupBy($"treat", $"post")
      .agg(count(lit(1)).as("n"), sum($"y").as("sy"),
        sum(($"y" * $"y").cast(dec2)).as("sy2"))
      .select($"treat", $"post", $"n",
        round($"sy".cast("double") / $"n".cast("double"), 8).as("m"),
        // unbiased per-cell variance of the MEAN: s^2/n
        round(($"sy2".cast("double") -
            $"sy".cast("double") * $"sy".cast("double") /
              $"n".cast("double")) /
          (($"n" - 1).cast("double") * $"n".cast("double")), 8).as("vm"))
    def cell(tr: Boolean, po: Boolean, c: String) =
      min(when($"treat" === tr && $"post" === po, col(c)))
    cells.agg(
      cell(true, false, "m").as("treated_pre"),
      cell(true, true, "m").as("treated_post"),
      cell(false, false, "m").as("control_pre"),
      cell(false, true, "m").as("control_post"),
      sum($"vm".cast(org.apache.spark.sql.types.DecimalType(28, 8)))
        .as("var_sum"))
      .select($"treated_pre", $"treated_post",
        $"control_pre", $"control_post",
        round(($"treated_post" - $"treated_pre") -
          ($"control_post" - $"control_pre"), 6).as("did_estimate"),
        round(sqrt($"var_sum".cast("double")), 6).as("se"),
        round((($"treated_post" - $"treated_pre") -
            ($"control_post" - $"control_pre")) /
          sqrt($"var_sum".cast("double")), 6)
          .as("t_stat"))
  }

  private val q269Sql =
    """WITH cells AS (
      |  SELECT treat, post, n,
      |    round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 8) AS m,
      |    round((CAST(sy2 AS DOUBLE) -
      |        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
      |      (CAST(n - 1 AS DOUBLE) * CAST(n AS DOUBLE)), 8) AS vm
      |  FROM (
      |    SELECT (c.c_mktsegment = 'BUILDING') AS treat,
      |      (o.o_orderdate >= TIMESTAMP '1998-01-01') AS post,
      |      CAST(count(*) AS BIGINT) AS n,
      |      sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS sy,
      |      sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) *
      |        CAST(o.o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
      |        AS sy2
      |    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |    GROUP BY 1, 2)),
      |wide AS (
      |  SELECT
      |    min(CASE WHEN treat AND NOT post THEN m END) AS treated_pre,
      |    min(CASE WHEN treat AND post THEN m END) AS treated_post,
      |    min(CASE WHEN NOT treat AND NOT post THEN m END) AS control_pre,
      |    min(CASE WHEN NOT treat AND post THEN m END) AS control_post,
      |    sum(CAST(vm AS DECIMAL(28,8))) AS var_sum
      |  FROM cells)
      |SELECT treated_pre, treated_post, control_pre, control_post,
      |  round((treated_post - treated_pre) - (control_post - control_pre),
      |    6) AS did_estimate,
      |  round(sqrt(CAST(var_sum AS DOUBLE)), 6) AS se,
      |  round(((treated_post - treated_pre) - (control_post - control_pre))
      |    / sqrt(CAST(var_sum AS DOUBLE)), 6) AS t_stat
      |FROM wide""".stripMargin

  private val ConformalBin = 5000.0

  /** q272: SPLIT CONFORMAL PREDICTION INTERVALS — the distribution-free
    * uncertainty wrapper (Vovk; Lei et al.) modern ML serving bolts
    * onto ANY point predictor: calibrate the (1−α) quantile of
    * held-out nonconformity scores, and the interval ±q̂ covers ≥90%
    * of exchangeable test points BY THEOREM, no matter how bad the
    * model. Units are customers, hash-split 50/25/25 train/cal/test
    * (the q50 deterministic coin); the predictor is the train-side
    * segment mean; scores are |y − ŷ|. The calibration quantile runs
    * at scale through FIXED-WIDTH SCORE TILES (the q263 histogram
    * device): per-segment bin counts, a bounded cumulative walk, and
    * the integer-exact nearest-rank test 10·cum ≥ 9·(n_cal+1); q̂
    * rounds UP to the bin edge, which only widens the interval — the
    * conformal guarantee survives the binning conservatively. Test
    * coverage is reported next to the ≥0.9 target.
    */
  def q272ConformalInterval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val rev = t(s, dir, "orders")
      .groupBy($"o_custkey").agg(sum($"o_totalprice".cast(dec)).as("rev"))
    val cust = t(s, dir, "customer")
      .join(rev, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"c_mktsegment",
        coalesce($"rev", lit(0).cast(dec)).cast("double").as("y"),
        substring(md5(concat(lit("cp:"), $"c_custkey".cast("string"))),
          1, 8).as("h"))
      .withColumn("split",
        when($"h" < "80000000", "train")
          .when($"h" < "c0000000", "cal").otherwise("test"))
      .persist()
    val pred = cust.filter($"split" === "train")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_train"),
        (sum($"y".cast(dec)).cast("double") /
          count(lit(1)).cast("double")).as("yhat"))
    val scored = cust.filter($"split" =!= "train")
      .join(broadcast(pred), Seq("c_mktsegment"))
      .withColumn("score", abs($"y" - $"yhat"))
    val calBins = scored.filter($"split" === "cal")
      .groupBy($"c_mktsegment",
        floor($"score" / ConformalBin).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
    val wSeg = Window.partitionBy($"c_mktsegment").orderBy($"bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // nearest-rank test 10*cum >= 9*(n_cal+1); when NO bin qualifies
    // (n_cal < 9 makes ceil(0.9*(n+1)) > n) the conformal convention
    // is q-hat = +inf — carried as NULL, the interval is unbounded
    val qhat = calBins
      .withColumn("cum", sum($"c").over(wSeg))
      .withColumn("ncal", sum($"c").over(Window.partitionBy($"c_mktsegment")))
      .groupBy($"c_mktsegment")
      .agg(max($"ncal").as("n_cal"),
        ((min(when($"cum" * 10 >= ($"ncal" + 1) * 9, $"bin")) + 1)
          .cast("double") * ConformalBin).as("qh"))
    val test = scored.filter($"split" === "test")
      .join(broadcast(qhat), Seq("c_mktsegment"))
      .groupBy($"c_mktsegment")
      .agg(max($"n_cal").as("n_cal"), count(lit(1)).as("n_test"),
        max($"qh").as("qhat"),
        round(sum(when($"qh".isNull || $"score" <= $"qh", 1L)
            .otherwise(0L))
          .cast("double") / count(lit(1)).cast("double"), 6)
          .as("coverage"))
    pred.join(test, Seq("c_mktsegment"))
      .select($"c_mktsegment", $"n_train", $"n_cal", $"n_test",
        round($"yhat", 6).as("yhat"), $"qhat", $"coverage")
      .orderBy($"c_mktsegment")
      .localCheckpoint()
  }

  private val q272Sql =
    """WITH rev AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |cust AS (
      |  SELECT c.c_custkey, c.c_mktsegment,
      |    CAST(coalesce(r.rev, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS y,
      |    CASE WHEN substr(md5('cp:' || c.c_custkey), 1, 8) < '80000000'
      |      THEN 'train'
      |      WHEN substr(md5('cp:' || c.c_custkey), 1, 8) < 'c0000000'
      |      THEN 'cal' ELSE 'test' END AS split
      |  FROM customer c LEFT JOIN rev r ON c.c_custkey = r.o_custkey),
      |pred AS (
      |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_train,
      |    CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) /
      |      CAST(count(*) AS DOUBLE) AS yhat
      |  FROM cust WHERE split = 'train' GROUP BY 1),
      |scored AS (
      |  SELECT cu.c_mktsegment, cu.split, abs(cu.y - p.yhat) AS score
      |  FROM cust cu JOIN pred p USING (c_mktsegment)
      |  WHERE cu.split <> 'train'),
      |cal_bins AS (
      |  SELECT c_mktsegment, CAST(floor(score / 5000.0) AS BIGINT) AS bin,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM scored WHERE split = 'cal' GROUP BY 1, 2),
      |walk AS (
      |  SELECT c_mktsegment, bin,
      |    CAST(sum(c) OVER (PARTITION BY c_mktsegment ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(sum(c) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS ncal
      |  FROM cal_bins),
      |qh AS (
      |  SELECT c_mktsegment, max(ncal) AS n_cal,
      |    CAST(min(CASE WHEN cum * 10 >= (ncal + 1) * 9 THEN bin END) + 1
      |      AS DOUBLE) * 5000.0 AS qh
      |  FROM walk
      |  GROUP BY 1),
      |tst AS (
      |  SELECT s.c_mktsegment, max(q.n_cal) AS n_cal,
      |    CAST(count(*) AS BIGINT) AS n_test, max(q.qh) AS qhat,
      |    round(CAST(sum(CASE WHEN q.qh IS NULL OR s.score <= q.qh
      |        THEN 1 ELSE 0 END)
      |        AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS coverage
      |  FROM scored s JOIN qh q USING (c_mktsegment)
      |  WHERE s.split = 'test' GROUP BY 1)
      |SELECT p.c_mktsegment, p.n_train, t.n_cal, t.n_test,
      |  round(p.yhat, 6) AS yhat, t.qhat, t.coverage
      |FROM pred p JOIN tst t USING (c_mktsegment)
      |ORDER BY p.c_mktsegment""".stripMargin

  /** q273: MANN–WHITNEY U — the nonparametric two-sample test the
    * drift family was missing: chi-square (q211) needs categories, KS
    * (q212) gauges the CDF sup-gap, MW-U tests STOCHASTIC DOMINANCE
    * (does one group's metric tend larger?) with no distributional
    * assumption — the robust default when revenue-like metrics are
    * heavy-tailed. Scale shape: collapse to the DISTINCT-VALUE grain
    * (cents), take tie-averaged ranks from ONE global prefix sum over
    * values ([[GlobalRank.withGlobalPrefixSums]] — the q212/q214
    * device, P-row driver state at any size), and reduce to exact
    * sufficient statistics: rank sums as DECIMAL(38,0) (2-scaled so
    * tie-averaged ranks stay integral), the tie-correction Σ(t³−t),
    * and the normal approximation with tie-corrected variance as one
    * final double expression. No corpus-sized sort, no window over the
    * raw stream.
    */
  def q273MannWhitney(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val byVal = t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select(($"o_totalprice".cast(
          org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("cents"),
        when($"c_mktsegment" === "BUILDING", 1L).otherwise(0L).as("t1"),
        lit(1L).as("one"))
      .groupBy($"cents")
      .agg(sum($"one").as("n"), sum($"t1").as("n1"))
    val cum = GlobalRank.withGlobalPrefixSums(
      byVal, Seq("n" -> "cumn"), $"cents".asc)
    // tie-averaged rank of every row at value v, 2-scaled to stay
    // integral: 2*avg_rank = 2*(cum_before) + n + 1
    val stats = cum.select($"n", $"n1",
      (($"cumn" - $"n") * 2 + $"n" + 1).as("rank2"))
      .agg(sum($"n").cast(dec0).as("ntot"),
        sum($"n1").cast(dec0).as("n1tot"),
        // cast BEFORE multiplying: n1·rank2 at 1e12 rows overflows long
        sum($"n1".cast(dec0) * $"rank2").as("r1x2"),
        sum(($"n" * $"n" * $"n" - $"n").cast(dec0)).as("ties"))
    val (n, n1, r12, ties) = ($"ntot".cast("double"), $"n1tot".cast("double"),
      $"r1x2".cast("double"), $"ties".cast("double"))
    val n2 = n - n1
    val u1 = (r12 - n1 * (n1 + 1)) / 2.0
    val varU = n1 * n2 / 12.0 *
      ((n + 1) - ties / (n * (n - 1)))
    stats.select(
      $"n1tot".cast("long").as("n_treat"),
      ($"ntot" - $"n1tot").cast("long").as("n_control"),
      round(u1, 1).as("u1"),
      round((u1 - n1 * n2 / 2.0) / sqrt(varU), 6).as("z"),
      round(lit(1.0) - lit(2.0) * u1 / (n1 * n2), 6).as("rank_biserial"))
  }

  private val q273Sql =
    """WITH byval AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    AS cents,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n1
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1),
      |cum AS (
      |  SELECT n, n1,
      |    (CAST(sum(n) OVER (ORDER BY cents) AS BIGINT) - n) * 2 + n + 1
      |      AS rank2
      |  FROM byval),
      |st AS (
      |  SELECT sum(CAST(n AS DECIMAL(38,0))) AS ntot,
      |    sum(CAST(n1 AS DECIMAL(38,0))) AS n1tot,
      |    sum(CAST(n1 * rank2 AS DECIMAL(38,0))) AS r1x2,
      |    sum(CAST(n * n * n - n AS DECIMAL(38,0))) AS ties
      |  FROM cum)
      |SELECT CAST(n1tot AS BIGINT) AS n_treat,
      |  CAST(ntot - n1tot AS BIGINT) AS n_control,
      |  round((CAST(r1x2 AS DOUBLE) - CAST(n1tot AS DOUBLE) *
      |    (CAST(n1tot AS DOUBLE) + 1)) / 2.0, 1) AS u1,
      |  round(((CAST(r1x2 AS DOUBLE) - CAST(n1tot AS DOUBLE) *
      |      (CAST(n1tot AS DOUBLE) + 1)) / 2.0 -
      |      CAST(n1tot AS DOUBLE) *
      |      (CAST(ntot AS DOUBLE) - CAST(n1tot AS DOUBLE)) / 2.0) /
      |    sqrt(CAST(n1tot AS DOUBLE) *
      |      (CAST(ntot AS DOUBLE) - CAST(n1tot AS DOUBLE)) / 12.0 *
      |      ((CAST(ntot AS DOUBLE) + 1) - CAST(ties AS DOUBLE) /
      |        (CAST(ntot AS DOUBLE) * (CAST(ntot AS DOUBLE) - 1)))), 6)
      |    AS z,
      |  round(1e0 - 2e0 * ((CAST(r1x2 AS DOUBLE) - CAST(n1tot AS DOUBLE) *
      |      (CAST(n1tot AS DOUBLE) + 1)) / 2.0) /
      |    (CAST(n1tot AS DOUBLE) *
      |      (CAST(ntot AS DOUBLE) - CAST(n1tot AS DOUBLE))), 6)
      |    AS rank_biserial
      |FROM st""".stripMargin

  /** q274: XmR (SHEWHART INDIVIDUALS) CONTROL CHART — the SPC
    * complement to CUSUM (q214): CUSUM finds WHERE the level shifted,
    * the XmR chart decides whether each month is OUT OF CONTROL
    * against natural process variation, with limits estimated from the
    * MOVING RANGE (mean |Δ| · 2.66 — Donald Wheeler's constant, robust
    * to the trend contaminating a plain σ estimate). Integer-exact
    * core: monthly cents, t-index and lag via
    * [[GlobalRank.withGlobalPrefixSums]] + a t=t−1 self-join (no
    * global window over the series), moving ranges as exact longs,
    * and ONE double expression for the limits, round(6)-pinned.
    */
  def q274XmrControlChart(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = t(s, dir, "orders")
      .groupBy(date_trunc("month", $"o_orderdate").as("m"))
      .agg((sum($"o_totalprice".cast(
        org.apache.spark.sql.types.DecimalType(18, 2))) * 100)
        .cast("long").as("cents"))
      .withColumn("one", lit(1L))
    val idx = GlobalRank.withGlobalPrefixSums(
      monthly, Seq("one" -> "t"), $"m".asc).persist()
    val mr = idx.select(($"t" + 1).as("tn"), $"cents".as("prev"))
    val withMr = idx.join(mr, $"t" === $"tn", "left")
      .select($"m", $"t", $"cents",
        when($"prev".isNotNull, abs($"cents" - $"prev")).as("mr"))
    val limits = withMr.agg(
      count(lit(1)).as("mm"), sum($"cents").as("tc"),
      sum($"mr").as("tmr"), count($"mr").as("nmr"))
    val out = withMr.crossJoin(broadcast(limits))
      .select($"m".cast("date").cast("string").as("month"),
        ($"cents" / lit(100.0)).as("revenue"),
        round($"mr" / lit(100.0), 2).as("moving_range"),
        round(($"tc".cast("double") / $"mm".cast("double")) / 100.0, 6)
          .as("center"),
        round(($"tc".cast("double") / $"mm".cast("double") +
          lit(2.66) * $"tmr".cast("double") / $"nmr".cast("double")) /
          100.0, 6).as("ucl"),
        round(($"tc".cast("double") / $"mm".cast("double") -
          lit(2.66) * $"tmr".cast("double") / $"nmr".cast("double")) /
          100.0, 6).as("lcl"),
        ($"cents".cast("double") >
          $"tc".cast("double") / $"mm".cast("double") +
            lit(2.66) * $"tmr".cast("double") / $"nmr".cast("double") ||
          $"cents".cast("double") <
          $"tc".cast("double") / $"mm".cast("double") -
            lit(2.66) * $"tmr".cast("double") / $"nmr".cast("double"))
          .as("out_of_control"))
      .orderBy($"month")
      .localCheckpoint()
    idx.unpersist()
    out
  }

  private val q274Sql =
    """WITH mo AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |idx AS (
      |  SELECT m, cents,
      |    CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t
      |  FROM mo),
      |wmr AS (
      |  SELECT a.m, a.t, a.cents,
      |    CASE WHEN b.cents IS NOT NULL THEN abs(a.cents - b.cents) END
      |      AS mr
      |  FROM idx a LEFT JOIN idx b ON a.t = b.t + 1),
      |lim AS (
      |  SELECT CAST(count(*) AS BIGINT) AS mm,
      |    CAST(sum(cents) AS BIGINT) AS tc,
      |    CAST(sum(mr) AS BIGINT) AS tmr,
      |    CAST(count(mr) AS BIGINT) AS nmr
      |  FROM wmr)
      |SELECT CAST(CAST(m AS DATE) AS VARCHAR) AS month,
      |  cents / 100.0 AS revenue,
      |  round(mr / 100.0, 2) AS moving_range,
      |  round((CAST(tc AS DOUBLE) / CAST(mm AS DOUBLE)) / 100.0, 6)
      |    AS center,
      |  round((CAST(tc AS DOUBLE) / CAST(mm AS DOUBLE) +
      |    2.66 * CAST(tmr AS DOUBLE) / CAST(nmr AS DOUBLE)) / 100.0, 6)
      |    AS ucl,
      |  round((CAST(tc AS DOUBLE) / CAST(mm AS DOUBLE) -
      |    2.66 * CAST(tmr AS DOUBLE) / CAST(nmr AS DOUBLE)) / 100.0, 6)
      |    AS lcl,
      |  (CAST(cents AS DOUBLE) >
      |     CAST(tc AS DOUBLE) / CAST(mm AS DOUBLE) +
      |       2.66 * CAST(tmr AS DOUBLE) / CAST(nmr AS DOUBLE) OR
      |   CAST(cents AS DOUBLE) <
      |     CAST(tc AS DOUBLE) / CAST(mm AS DOUBLE) -
      |       2.66 * CAST(tmr AS DOUBLE) / CAST(nmr AS DOUBLE))
      |    AS out_of_control
      |FROM wmr CROSS JOIN lim
      |ORDER BY month""".stripMargin

  /** q280: THEIL INDEX with EXACT between/within DECOMPOSITION — what
    * Gini (q265) cannot do: Theil's entropy-based inequality measure
    * decomposes ADDITIVELY into a between-group term plus a weighted
    * within-group sum (T = T_b + Σ s_g·T_g, exact by algebra), so a
    * platform can answer "is revenue inequality driven by nation mix
    * or within-nation spread?" — the decomposition every inequality
    * dashboard actually wants. One fact scan to customer revenue
    * (x > 0 only: Theil needs logs), one 1-row global attach, then
    * per-customer terms x·ln(n·x/X) round(12)-pinned into DECIMAL
    * before the nation rollup (the q82 discipline), so both engines
    * sum identical decimals. The spec re-verifies the decomposition
    * identity to 1e-9.
    */
  def q280TheilDecomposition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec12 = org.apache.spark.sql.types.DecimalType(30, 12)
    val x = t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast(
        org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("x"))
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, dir, "nation")),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"x")
      .filter($"x" > 0)
      .persist()
    val g = x.agg(count(lit(1)).as("n"),
      sum($"x".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("xx"))
    val terms = x.crossJoin(broadcast(g))
      .select($"n_name",
        round($"x" * log($"n" * $"x" / $"xx"), 12).cast(dec12).as("tx"),
        $"x".cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("xd"),
        $"n".as("n"), $"xx".as("xx"))
    val byNation = terms.groupBy($"n_name")
      .agg(count(lit(1)).as("ng"), sum($"xd").cast("double").as("xg"),
        sum($"tx").cast("double").as("txg"),
        max($"n").as("n"), max($"xx").as("xx"))
    val out = byNation.select($"n_name", $"ng".as("n_customers"),
        round($"xg" / $"xx", 6).as("revenue_share"),
        // T_g: within-nation Theil from the SAME pinned terms, shifted
        // to the group frame: sum(x*ln(n*x/X))/Xg - ln(n*Xg/(ng*X))
        round($"txg" / $"xg" -
          log($"n".cast("double") * $"xg" /
            ($"ng".cast("double") * $"xx")), 6).as("theil_within"),
        round(($"xg" / $"xx") *
          log(($"xg" / $"xx") / ($"ng".cast("double") /
            $"n".cast("double"))), 6).as("between_contrib"),
        round($"txg" / $"xx", 6).as("total_contrib"))
      .orderBy($"n_name")
      .localCheckpoint()
    x.unpersist()
    out
  }

  private val q280Sql =
    """WITH x AS (
      |  SELECT n.n_name,
      |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY o.o_custkey, n.n_name
      |  HAVING CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    > 0),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS xx
      |  FROM x),
      |terms AS (
      |  SELECT n_name,
      |    CAST(round(x * ln(n * x / xx), 12) AS DECIMAL(30,12)) AS tx,
      |    CAST(x AS DECIMAL(18,2)) AS xd, n, xx
      |  FROM x CROSS JOIN g),
      |by_nation AS (
      |  SELECT n_name, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(xd) AS DOUBLE) AS xg,
      |    CAST(sum(tx) AS DOUBLE) AS txg,
      |    max(n) AS n, max(xx) AS xx
      |  FROM terms GROUP BY 1)
      |SELECT n_name, ng AS n_customers,
      |  round(xg / xx, 6) AS revenue_share,
      |  round(txg / xg -
      |    ln(CAST(n AS DOUBLE) * xg / (CAST(ng AS DOUBLE) * xx)), 6)
      |    AS theil_within,
      |  round((xg / xx) *
      |    ln((xg / xx) / (CAST(ng AS DOUBLE) / CAST(n AS DOUBLE))), 6)
      |    AS between_contrib,
      |  round(txg / xx, 6) AS total_contrib
      |FROM by_nation
      |ORDER BY n_name""".stripMargin

  /** q281: SPEARMAN RANK CORRELATION (tie-averaged) between order
    * frequency and spend — the robust monotone-association measure
    * beside Pearson (q110's shape): invariant to heavy tails, exactly
    * what revenue-like metrics need. Tie handling is the REAL average-
    * rank definition, computed at scale the q273 way: collapse each
    * variable to its DISTINCT-VALUE grain, one global prefix sum
    * ([[GlobalRank.withGlobalPrefixSums]]) gives 2-scaled integral
    * average ranks, join back, and Pearson runs on DECIMAL-exact rank
    * sums (2-scaled ranks are integers, so every product is exact).
    * One double expression at the end for ρ and its t-statistic.
    */
  def q281SpearmanRho(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("freq"),
        (sum($"o_totalprice".cast(
          org.apache.spark.sql.types.DecimalType(18, 2))) * 100)
          .cast("long").as("cents"))
      .persist()
    def avgRank2(col0: String): DataFrame = {
      val byVal = base.groupBy(col(col0).as("v"))
        .agg(count(lit(1)).as("cnt"))
      GlobalRank.withGlobalPrefixSums(byVal, Seq("cnt" -> "cum"),
          $"v".asc)
        .select($"v", (($"cum" - $"cnt") * 2 + $"cnt" + 1).as("rank2"))
    }
    val r1 = avgRank2("freq").withColumnRenamed("rank2", "ra")
      .withColumnRenamed("v", "freq").localCheckpoint()
    val r2 = avgRank2("cents").withColumnRenamed("rank2", "rb")
      .withColumnRenamed("v", "cents").localCheckpoint()
    val joined = base.join(r1, Seq("freq")).join(r2, Seq("cents"))
    val st = joined.agg(count(lit(1)).as("n"),
      sum($"ra".cast(dec0)).as("sa"), sum($"rb".cast(dec0)).as("sb"),
      sum($"ra".cast(dec0) * $"rb").as("sab"),
      sum($"ra".cast(dec0) * $"ra").as("sa2"),
      sum($"rb".cast(dec0) * $"rb").as("sb2"))
    val (n, sa, sb, sab, sa2, sb2) = ($"n".cast("double"),
      $"sa".cast("double"), $"sb".cast("double"), $"sab".cast("double"),
      $"sa2".cast("double"), $"sb2".cast("double"))
    val rho = (n * sab - sa * sb) /
      sqrt((n * sa2 - sa * sa) * (n * sb2 - sb * sb))
    val out = st.select($"n".as("n_customers"),
      round(rho, 6).as("spearman_rho"),
      round(rho * sqrt((n - 2) / (lit(1.0) - rho * rho)), 6).as("t_stat"))
    // eager checkpoint materializes before the base cache is released
    val res = out.localCheckpoint()
    base.unpersist()
    res
  }

  private val q281Sql =
    """WITH base AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS freq,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |ra AS (
      |  SELECT freq AS v,
      |    (CAST(sum(cnt) OVER (ORDER BY freq) AS BIGINT) - cnt) * 2
      |      + cnt + 1 AS ra
      |  FROM (SELECT freq, CAST(count(*) AS BIGINT) AS cnt
      |        FROM base GROUP BY 1)),
      |rb AS (
      |  SELECT cents AS v,
      |    (CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) - cnt) * 2
      |      + cnt + 1 AS rb
      |  FROM (SELECT cents, CAST(count(*) AS BIGINT) AS cnt
      |        FROM base GROUP BY 1)),
      |j AS (
      |  SELECT ra.ra, rb.rb
      |  FROM base JOIN ra ON base.freq = ra.v
      |  JOIN rb ON base.cents = rb.v),
      |st AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(ra AS DECIMAL(38,0))) AS sa,
      |    sum(CAST(rb AS DECIMAL(38,0))) AS sb,
      |    sum(CAST(ra AS DECIMAL(38,0)) * rb) AS sab,
      |    sum(CAST(ra AS DECIMAL(38,0)) * ra) AS sa2,
      |    sum(CAST(rb AS DECIMAL(38,0)) * rb) AS sb2
      |  FROM j)
      |SELECT n AS n_customers,
      |  round((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) -
      |      CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
      |    sqrt((CAST(n AS DOUBLE) * CAST(sa2 AS DOUBLE) -
      |        CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
      |      (CAST(n AS DOUBLE) * CAST(sb2 AS DOUBLE) -
      |        CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
      |    AS spearman_rho,
      |  round(((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) -
      |      CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
      |    sqrt((CAST(n AS DOUBLE) * CAST(sa2 AS DOUBLE) -
      |        CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
      |      (CAST(n AS DOUBLE) * CAST(sb2 AS DOUBLE) -
      |        CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))) *
      |    sqrt((CAST(n AS DOUBLE) - 2) /
      |      (1e0 - ((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) -
      |          CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
      |        sqrt((CAST(n AS DOUBLE) * CAST(sa2 AS DOUBLE) -
      |            CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
      |          (CAST(n AS DOUBLE) * CAST(sb2 AS DOUBLE) -
      |            CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))) *
      |        ((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) -
      |          CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
      |        sqrt((CAST(n AS DOUBLE) * CAST(sa2 AS DOUBLE) -
      |            CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
      |          (CAST(n AS DOUBLE) * CAST(sb2 AS DOUBLE) -
      |            CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))))), 6)
      |    AS t_stat
      |FROM st""".stripMargin

  /** q282: CUMULATIVE GAINS / LIFT TABLE — how model-scoring quality
    * reaches the business: "mailing the top 2 deciles captures X% of
    * buyers at Y× random". Score = 1997 revenue, label = bought again
    * in 1998+; deciles from ONE exact global rank
    * ([[GlobalRank.withGlobalRankCounted]], range partitioning — no
    * single-partition sort), integer ceil-division decile ids, decile
    * census, then the cumulative walk runs on the bounded 10-row
    * table. AUC (q166's family) grades the ranking abstractly; the
    * gains table is the deployable version. Everything after the rank
    * is integer-exact; rates are one division each, round(6).
    */
  def q282CumulativeGains(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val byCust = t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(when($"o_orderdate" < lit("1998-01-01").cast("timestamp_ntz"),
          $"o_totalprice".cast(dec)).otherwise(lit(0).cast(dec)))
          .as("score"),
        max(when($"o_orderdate" >= lit("1998-01-01").cast("timestamp_ntz"),
          1L).otherwise(0L)).as("label"))
    val (ranked, n) = GlobalRank.withGlobalRankCounted(
      byCust, "rk", $"score".desc, $"o_custkey".asc)
    val deciles = ranked
      .withColumn("decile", (($"rk" * 10 - 1) / lit(n)).cast("long") + 1)
      .groupBy($"decile")
      .agg(count(lit(1)).as("n"), sum($"label").as("pos"))
      .localCheckpoint()
    val wCum = Window.orderBy($"decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = deciles.agg(sum($"n").as("nt"), sum($"pos").as("pt"))
    deciles
      .withColumn("cn", sum($"n").over(wCum))
      .withColumn("cp", sum($"pos").over(wCum))
      .crossJoin(broadcast(tot))
      .select($"decile", $"n".as("n_customers"), $"pos".as("n_buyers"),
        round($"cp".cast("double") / $"pt".cast("double"), 6)
          .as("cum_gain"),
        round(($"cp".cast("double") / $"pt".cast("double")) /
          ($"cn".cast("double") / $"nt".cast("double")), 6).as("cum_lift"))
      .orderBy($"decile")
  }

  private val q282Sql =
    """WITH by_cust AS (
      |  SELECT o_custkey,
      |    sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
      |      THEN CAST(o_totalprice AS DECIMAL(18,2))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS score,
      |    max(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
      |      THEN 1 ELSE 0 END) AS label
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT label,
      |    CAST(row_number() OVER (ORDER BY score DESC, o_custkey ASC)
      |      AS BIGINT) AS rk,
      |    CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM by_cust),
      |deciles AS (
      |  SELECT (rk * 10 - 1) // n + 1 AS decile,
      |    CAST(count(*) AS BIGINT) AS n, CAST(sum(label) AS BIGINT) AS pos
      |  FROM ranked GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
      |               CAST(sum(pos) AS BIGINT) AS pt FROM deciles),
      |walk AS (
      |  SELECT decile, n, pos,
      |    CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cn,
      |    CAST(sum(pos) OVER (ORDER BY decile) AS BIGINT) AS cp
      |  FROM deciles)
      |SELECT decile, n AS n_customers, pos AS n_buyers,
      |  round(CAST(cp AS DOUBLE) / CAST(pt AS DOUBLE), 6) AS cum_gain,
      |  round((CAST(cp AS DOUBLE) / CAST(pt AS DOUBLE)) /
      |    (CAST(cn AS DOUBLE) / CAST(nt AS DOUBLE)), 6) AS cum_lift
      |FROM walk CROSS JOIN tot
      |ORDER BY decile""".stripMargin

  /** q285: DECLARATIVE EXPECTATION SUITE — the Great-Expectations /
    * dbt-test runner shape, generalized: a fixed rule list (not-null,
    * uniqueness, accepted values, numeric range, referential
    * integrity, freshness) evaluated PROGRAMMATICALLY into one
    * uniform (rule, violations, passed) report. Each rule is one
    * aggregate or anti-join over its table — the report union is
    * rule-count-bounded, every check is scan-shaped, and adding a rule
    * is data, not code. Complements `pipeline.Checks` (the reference's
    * dbt tests, fixed by the DAG) with the open-ended suite a data
    * platform runs on EVERY table.
    */
  def q285ExpectationSuite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def rule(id: Int, name: String, violations: DataFrame): DataFrame =
      violations.select(lit(id).as("rule_id"), lit(name).as("rule"),
        $"v".cast("long").as("violations"), ($"v" === 0).as("passed"))
    val orders = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
    val checks = Seq(
      rule(1, "customer.c_name not_null",
        t(s, dir, "customer").agg(
          sum(when($"c_name".isNull, 1L).otherwise(0L)).as("v"))),
      rule(2, "orders.o_orderkey unique",
        orders.groupBy($"o_orderkey").agg(count(lit(1)).as("c"))
          .agg(sum(when($"c" > 1, $"c" - 1).otherwise(0L)).as("v"))),
      rule(3, "orders.o_orderstatus accepted_values [O,F,P]",
        orders.agg(sum(when(!$"o_orderstatus".isin("O", "F", "P"), 1L)
          .otherwise(0L)).as("v"))),
      rule(4, "lineitem.l_discount in [0, 0.1]",
        li.agg(sum(when($"l_discount" < 0 || $"l_discount" > 0.1, 1L)
          .otherwise(0L)).as("v"))),
      rule(5, "lineitem.l_orderkey references orders",
        li.select($"l_orderkey").distinct()
          .join(orders.select($"o_orderkey"),
            $"l_orderkey" === $"o_orderkey", "left_anti")
          .agg(count(lit(1)).as("v"))),
      rule(6, "orders fresh through 2001",
        orders.agg(when(max($"o_orderdate") >=
          lit("2001-01-01").cast("timestamp_ntz"), 0L).otherwise(1L)
          .as("v"))))
    checks.reduce(_ unionByName _).orderBy($"rule_id")
  }

  private val q285Sql =
    """SELECT * FROM (
      |  SELECT 1 AS rule_id, 'customer.c_name not_null' AS rule,
      |    CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS violations,
      |    sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) = 0 AS passed
      |  FROM customer
      |  UNION ALL
      |  SELECT 2, 'orders.o_orderkey unique',
      |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END), 0)
      |      AS BIGINT),
      |    coalesce(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END), 0) = 0
      |  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
      |  UNION ALL
      |  SELECT 3, 'orders.o_orderstatus accepted_values [O,F,P]',
      |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
      |      THEN 1 ELSE 0 END) AS BIGINT),
      |    sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
      |      THEN 1 ELSE 0 END) = 0
      |  FROM orders
      |  UNION ALL
      |  SELECT 4, 'lineitem.l_discount in [0, 0.1]',
      |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
      |      THEN 1 ELSE 0 END) AS BIGINT),
      |    sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
      |      THEN 1 ELSE 0 END) = 0
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 5, 'lineitem.l_orderkey references orders',
      |    CAST(count(*) AS BIGINT), count(*) = 0
      |  FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 6, 'orders fresh through 2001',
      |    CAST(CASE WHEN max(o_orderdate) >= TIMESTAMP '2001-01-01'
      |      THEN 0 ELSE 1 END AS BIGINT),
      |    max(o_orderdate) >= TIMESTAMP '2001-01-01'
      |  FROM orders)
      |ORDER BY rule_id""".stripMargin

  /** q286: WILSON SCORE INTERVALS for per-brand return rates — the
    * correct small-n rate CI (the Wald interval collapses at p near
    * 0/1 and small n; Wilson is what ranking and A/B systems actually
    * use). Exact integer (n, bad) per brand from one scan; the
    * interval is one fixed closed-form expression (z=1.96), and each
    * brand is flagged when its CI EXCLUDES the global rate — the
    * multiple-comparison-honest way to call out over/under-returning
    * brands (a point estimate alone flags noise). Global rate is a
    * 1-row broadcast attach; round(6) pins every float.
    */
  def q286WilsonInterval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val Z = 1.96
    val byBrand = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"),
        sum(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("bad"))
    val g = byBrand.agg(sum($"n").as("gn"), sum($"bad").as("gbad"))
    val n = $"n".cast("double"); val p = $"bad".cast("double") / n
    // z² as the PARSED literal 3.8416, not Z*Z: the Scala double
    // product of 1.96² and the SQL-parsed "3.8416" can differ by 1 ulp
    val z2 = lit(3.8416)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = (lit(Z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n))) / denom
    byBrand.crossJoin(broadcast(g))
      .select($"p_brand", $"n".as("n_lines"), $"bad".as("n_returned"),
        round(p, 6).as("rate"),
        round(center - half, 6).as("wilson_lo"),
        round(center + half, 6).as("wilson_hi"),
        (center + half < $"gbad".cast("double") / $"gn".cast("double") ||
          center - half > $"gbad".cast("double") / $"gn".cast("double"))
          .as("differs_from_global"))
      .orderBy($"p_brand")
  }

  private val q286Sql =
    """WITH by_brand AS (
      |  SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS bad
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1),
      |g AS (SELECT CAST(sum(n) AS BIGINT) AS gn,
      |             CAST(sum(bad) AS BIGINT) AS gbad FROM by_brand)
      |SELECT p_brand, n AS n_lines, bad AS n_returned,
      |  round(CAST(bad AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
      |  round(((CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) +
      |      3.8416 / (2.0 * CAST(n AS DOUBLE))) /
      |      (1e0 + 3.8416 / CAST(n AS DOUBLE)) -
      |    (1.96 * sqrt((CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) *
      |        (1e0 - CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) /
      |        CAST(n AS DOUBLE) +
      |      3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) /
      |      (1e0 + 3.8416 / CAST(n AS DOUBLE)), 6) AS wilson_lo,
      |  round(((CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) +
      |      3.8416 / (2.0 * CAST(n AS DOUBLE))) /
      |      (1e0 + 3.8416 / CAST(n AS DOUBLE)) +
      |    (1.96 * sqrt((CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) *
      |        (1e0 - CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) /
      |        CAST(n AS DOUBLE) +
      |      3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) /
      |      (1e0 + 3.8416 / CAST(n AS DOUBLE)), 6) AS wilson_hi,
      |  (((CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) +
      |      3.8416 / (2.0 * CAST(n AS DOUBLE))) /
      |      (1e0 + 3.8416 / CAST(n AS DOUBLE)) +
      |    (1.96 * sqrt((CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) *
      |        (1e0 - CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) /
      |        CAST(n AS DOUBLE) +
      |      3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) /
      |      (1e0 + 3.8416 / CAST(n AS DOUBLE))
      |    < CAST(gbad AS DOUBLE) / CAST(gn AS DOUBLE)
      |   OR
      |   ((CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) +
      |      3.8416 / (2.0 * CAST(n AS DOUBLE))) /
      |      (1e0 + 3.8416 / CAST(n AS DOUBLE)) -
      |    (1.96 * sqrt((CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) *
      |        (1e0 - CAST(bad AS DOUBLE) / CAST(n AS DOUBLE)) /
      |        CAST(n AS DOUBLE) +
      |      3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) /
      |      (1e0 + 3.8416 / CAST(n AS DOUBLE))
      |    > CAST(gbad AS DOUBLE) / CAST(gn AS DOUBLE))
      |    AS differs_from_global
      |FROM by_brand CROSS JOIN g
      |ORDER BY p_brand""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q285_expectation_suite", Seq("EXT-olap", "P6", "A2"),
      "declarative expectation-suite runner: not-null/unique/values/range/referential/freshness rules into one uniform pass-fail report",
      q285ExpectationSuite, Some(q285Sql)),
    GraftQuery("q286_wilson_interval", Seq("EXT-olap", "A2", "J1"),
      "Wilson score CIs for per-brand return rates with CI-vs-global flags: exact integer counts, one closed-form expression",
      q286WilsonInterval, Some(q286Sql)),
    GraftQuery("q280_theil_decomposition", Seq("EXT-olap", "A2", "J1"),
      "Theil inequality with exact between/within decomposition: decimal-pinned x*ln terms, per-nation rollup, identity spec-verified",
      q280TheilDecomposition, Some(q280Sql)),
    GraftQuery("q281_spearman_rho", Seq("EXT-olap", "A2"),
      "tie-averaged Spearman rank correlation: 2-scaled integral average ranks from the prefix device, decimal-exact Pearson on ranks",
      q281SpearmanRho, Some(q281Sql)),
    GraftQuery("q282_cumulative_gains", Seq("EXT-olap", "EXT-percentile", "A2"),
      "cumulative gains/lift table: one exact global rank into integer deciles, bounded 10-row cumulative walk",
      q282CumulativeGains, Some(q282Sql)),
    GraftQuery("q272_conformal_interval",
      Seq("EXT-approx", "EXT-histogram", "EXT-split", "A2"),
      "split conformal prediction: hash-split calibration, histogram-tile quantile with integer nearest-rank test, test coverage vs the 0.9 target",
      q272ConformalInterval, Some(q272Sql)),
    GraftQuery("q273_mann_whitney", Seq("EXT-olap", "A2", "J1"),
      "Mann-Whitney U on the distinct-value grain: tie-averaged ranks from one global prefix sum, tie-corrected normal z, rank-biserial effect",
      q273MannWhitney, Some(q273Sql)),
    GraftQuery("q274_xmr_control_chart", Seq("EXT-olap", "EXT-window", "A2"),
      "Shewhart XmR chart: integer-exact moving ranges via prefix-index self-join, Wheeler 2.66 limits, per-month out-of-control flags",
      q274XmrControlChart, Some(q274Sql)),
    GraftQuery("q268_cuped", Seq("EXT-olap", "A2", "J1"),
      "CUPED variance reduction: decimal-exact covariance statistics, per-segment adjusted means without a second pass, 1-rho^2 ratio",
      q268Cuped, Some(q268Sql)),
    GraftQuery("q269_diff_in_diff", Seq("EXT-olap", "A2", "J1"),
      "2x2 difference-in-differences: four decimal-exact cell means assembled by conditional extraction, Welch SE and t-stat",
      q269DiffInDiff, Some(q269Sql)),
    GraftQuery("q264_poisson_bootstrap", Seq("EXT-sample", "EXT-approx", "A2"),
      "Poisson bootstrap CI: 32 hash-deterministic Poisson(1) replicate weights in one scan, nearest-rank p05/p95, decimal-exact SE",
      q264PoissonBootstrap, Some(q264Sql)),
    GraftQuery("q265_gini_concentration", Seq("EXT-olap", "A2", "W1"),
      "per-nation Gini + HHI revenue concentration: nation-partitioned rank formula over decimal-exact sufficient statistics",
      q265GiniConcentration, Some(q265Sql)),
    GraftQuery("q266_isotonic_calibration", Seq("EXT-olap", "EXT-histogram", "A2"),
      "isotonic calibration fit: exact PAVA via minimax over the bounded bin table, fact table touched once",
      q266IsotonicCalibration, Some(q266Sql)),
    GraftQuery("q252_column_lineage", Seq("EXT-olap", "S9"),
      "column-level lineage extracted from the analyzed plan (bottom-up exprId provenance), verified against hand-derived truth",
      q252ColumnLineage, Some(q252Sql)),
    GraftQuery("q230_rendezvous_sharding", Seq("EXT-olap", "A2", "EXT-split"),
      "rendezvous-hash shard assignment: argmax struct-max over 17 candidate hashes, measured 1/17 rebalance churn vs ~94% mod-hash churn",
      q230RendezvousSharding, Some(q230Sql)),
    GraftQuery("q223_mmd_drift", Seq("EXT-olap", "A2", "EXT-approx"),
      "linear-time MMD^2 two-sample embedding-drift test: paired quadruples, polynomial kernel, decimal-exact mean",
      q223MmdDrift, Some(q223Sql)),
    GraftQuery("q214_cusum_changepoint", Seq("EXT-olap", "A2", "EXT-window"),
      "CUSUM change-point: integer-exact centered running sums via global prefix device, peak month flagged",
      q214CusumChangepoint, Some(q214Sql)),
    GraftQuery("q213_info_gain", Seq("EXT-olap", "A2", "P6"),
      "information-gain feature audit: one-scan exploded contingency cells, exact-decimal entropies, C4.5 gain ratio",
      q213InfoGain, Some(q213Sql)),
    GraftQuery("q212_ks_test", Seq("EXT-olap", "A2", "EXT-percentile"),
      "two-sample KS drift test: era CDFs via range-partitioned global prefix sums, exact sup-gap",
      q212KsTest, Some(q212Sql)),
    GraftQuery("q211_chi2_independence", Seq("EXT-olap", "A2", "P6"),
      "chi-square independence audit: exact-marginal contingency table with per-cell contributions",
      q211Chi2Independence, Some(q211Sql)),
    GraftQuery("q210_psi_drift", Seq("EXT-olap", "A2", "EXT-percentile"),
      "PSI drift audit: reference-era decile edges pin scan-local binning of the current era, per-bin terms",
      q210PsiDrift, Some(q210Sql)),
    GraftQuery("q209_fd_discovery", Seq("EXT-olap", "A2", "P6"),
      "functional-dependency discovery: exact per-LHS group cardinalities grade holds/approx/unrelated",
      q209FdDiscovery, Some(q209Sql)),
    GraftQuery("q199_benford", Seq("EXT-olap", "P6", "A2"),
      "Benford first-digit audit: integer-exact digits, decimal chi-square, df=8 gate",
      q199Benford, Some(q199Sql)),
    GraftQuery("q200_clamped_balance", Seq("EXT-window", "W1"),
      "floor-at-zero running balance via the Skorokhod reflection - two windows, no recursion",
      q200ClampedBalance, Some(q200Sql)),
    GraftQuery("q195_event_pattern", Seq("EXT-funnel", "W1", "A3"),
      "CEP pattern matching: sessionized event streams folded to ordered strings, regex-matched",
      q195EventPattern, Some(q195Sql)),
    GraftQuery("q196_masked_view", Seq("EXT-anonymize", "P6"),
      "policy-driven column masking + row-level security, both role views hash-pinned",
      q196MaskedView, Some(q196Sql)),
    GraftQuery("q197_weighted_median", Seq("EXT-percentile", "W1"),
      "weighted median per group via an integer-exact running-weight crossing",
      q197WeightedMedian, Some(q197Sql)),
    GraftQuery("q198_fk_inference", Seq("EXT-olap", "J3", "A1"),
      "join-key discovery: containment + uniqueness classification with a negative control",
      q198FkInference, Some(q198Sql)))
}
