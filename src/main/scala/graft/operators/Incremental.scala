package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, Tables}
import graft.functions.Fns._

/** Incremental materialization machinery (SURVEY.md §2.1 S6 + §2.3 J4):
  * dbt's `materialized: incremental` + `unique_key` MERGE, re-expressed
  * for plain Parquet as keyed upsert = left-anti(existing) ∪ incoming.
  * Signature kept MERGE-shaped so a Delta `MERGE INTO` can be swapped in
  * unchanged on a lakehouse deployment (SURVEY.md §7.3).
  *
  * Scale: the anti-join shuffles both sides on the key once; with the
  * target bucketed by key (Pipeline writes bucketed at scale) the existing
  * side's shuffle disappears. Incoming batches are typically small
  * relative to the target → AQE picks a broadcast anti-join.
  */
object Incremental {

  /** MERGE-on-key semantics: rows of `existing` whose key appears in
    * `incoming` are replaced; all `incoming` rows land. Matches the
    * reference's dbt-snowflake merge strategy (dbt_project.yml:38-56).
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(incoming, keys, "left_anti").unionByName(incoming)

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Per-customer order summary restricted to a date window — the
    * batch-shaped input both incremental queries build on.
    */
  private def custSummary(s: SparkSession, dir: String, lo: String, hi: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_orderdate" >= lit(lo).cast("timestamp") &&
        $"o_orderdate" < lit(hi).cast("timestamp"))
      .groupBy($"o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        exactSum2($"o_totalprice").as("total_spend"),
        max($"o_orderdate").as("last_order"))
  }

  /** q15: keyed upsert (S6/J4): the 1995-96 per-customer summary is the
    * existing target; the 1997-98 summary is the incoming batch; matched
    * keys are replaced, unmatched existing rows survive (the windows sit
    * inside the 1995+ order data so BOTH merge branches carry rows).
    */
  def q15Upsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val existing = custSummary(s, dir, "1995-01-01", "1997-01-01")
    val incoming = custSummary(s, dir, "1997-01-01", "1999-01-01")
    upsert(existing, incoming, Seq("o_custkey")).orderBy($"o_custkey")
  }

  private val q15Sql =
    """WITH existing AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
      |    max(o_orderdate) AS last_order
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY o_custkey),
      |incoming AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
      |    max(o_orderdate) AS last_order
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |  GROUP BY o_custkey)
      |SELECT * FROM (
      |  SELECT * FROM existing WHERE o_custkey NOT IN (SELECT o_custkey FROM incoming)
      |  UNION ALL
      |  SELECT * FROM incoming)
      |ORDER BY o_custkey""".stripMargin

  /** Latest order state per customer within a date window — the
    * snapshot-batch shape (one row per key, business updated_at).
    */
  private def custState(s: SparkSession, dir: String, lo: String, hi: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    t(s, dir, "orders")
      .filter($"o_orderdate" >= lit(lo).cast("timestamp") &&
        $"o_orderdate" < lit(hi).cast("timestamp"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"o_custkey".as("custkey"),
        $"o_orderstatus".as("status"),
        $"o_totalprice".as("totalprice"),
        $"o_orderdate".as("last_updated"))
  }

  /** q16: two-run SCD2 snapshot (§2.9): run 1 ingests each customer's 1995
    * state; run 2 ingests the 1996-1997 state as-of 1998-01-01. Exercises
    * all three mutation paths deterministically: newer-timestamp
    * supersede (close + new version), brand-new key insert, and
    * hard-delete invalidation (customer active in 1995, silent after).
    */
  def q16Scd2Snapshot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // persist both window-derived inputs: Scd2.snapshot references the
    // history twice (closed/current split) and the batch three times
    // (supersede join, insert anti-join, hard-delete anti-join) — without
    // this each reference recomputes the orders window from the scan
    // (the Pipeline caller reads history from parquet, so the library
    // correctly leaves caching to the caller)
    val b1 = custState(s, dir, "1995-01-01", "1996-01-01")
    val b2 = custState(s, dir, "1996-01-01", "1998-01-01").persist()
    val run1 = Scd2.firstRun(b1, Seq("custkey"), "last_updated").persist()
    val run2 = Scd2.snapshot(run1, b2, Seq("custkey"), "last_updated",
      asOf = lit("1998-01-01 00:00:00").cast("timestamp"))
    run2
      .select($"custkey", $"status", $"totalprice", $"dbt_updated_at",
        $"dbt_valid_from", $"dbt_valid_to", $"dbt_scd_id")
      .orderBy($"custkey", $"dbt_valid_from")
  }

  private val q16Sql =
    """WITH b1 AS (
      |  SELECT o_custkey AS custkey, o_orderstatus AS status, o_totalprice AS totalprice,
      |         o_orderdate AS last_updated
      |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |        FROM orders
      |        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
      |  WHERE rn = 1),
      |b2 AS (
      |  SELECT o_custkey AS custkey, o_orderstatus AS status, o_totalprice AS totalprice,
      |         o_orderdate AS last_updated
      |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |        FROM orders
      |        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |  WHERE rn = 1),
      |v1 AS (
      |  SELECT b1.custkey, b1.status, b1.totalprice,
      |         b1.last_updated AS dbt_updated_at,
      |         b1.last_updated AS dbt_valid_from,
      |         CASE WHEN b2.custkey IS NULL THEN TIMESTAMP '1998-01-01 00:00:00'
      |              WHEN b2.last_updated > b1.last_updated THEN b2.last_updated
      |              ELSE NULL END AS dbt_valid_to
      |  FROM b1 LEFT JOIN b2 ON b1.custkey = b2.custkey),
      |v2 AS (
      |  SELECT b2.custkey, b2.status, b2.totalprice,
      |         b2.last_updated AS dbt_updated_at,
      |         b2.last_updated AS dbt_valid_from,
      |         CAST(NULL AS TIMESTAMP) AS dbt_valid_to
      |  FROM b2 LEFT JOIN b1 ON b2.custkey = b1.custkey
      |  WHERE b1.custkey IS NULL OR b2.last_updated > b1.last_updated)
      |SELECT custkey, status, totalprice, dbt_updated_at, dbt_valid_from, dbt_valid_to,
      |  md5(concat_ws('|', CAST(custkey AS VARCHAR), CAST(dbt_updated_at AS VARCHAR))) AS dbt_scd_id
      |FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
      |ORDER BY custkey, dbt_valid_from""".stripMargin

  /** CDC apply: collapse an ordered change stream (upserts + deletes per
    * key) into final table state — MERGE's three-way semantics
    * (WHEN MATCHED UPDATE / WHEN MATCHED AND op='D' DELETE / WHEN NOT
    * MATCHED INSERT) after the per-key latest-wins collapse. One shuffle
    * on the key, one window pass; at 100 TB the change stream is tiny
    * next to the target, so the collapsed batch feeds [[upsert]] (or a
    * Delta MERGE) unchanged.
    *
    * @param orderCols latest-wins ordering (applied descending); include
    *                  a unique column last for determinism.
    */
  def applyCdc(changes: DataFrame, keys: Seq[String], orderCols: Seq[String],
      opCol: String = "op", deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn", opCol)
  }

  /** q47: CDC apply over the events table read as a change stream:
    * 'error' events are deletes, everything else an upsert; each user's
    * final state is the latest non-superseded change, and a user whose
    * last event errored is absent from the result.
    */
  def q47CdcApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val changes = t(s, dir, "events").select(
      $"user_id", $"ts", $"event_id",
      when($"event_type" === "error", "D").otherwise("U").as("op"),
      $"event_type", $"value")
    applyCdc(changes, Seq("user_id"), Seq("ts", "event_id"))
      .select($"user_id", $"event_type", $"value", $"ts".as("updated_at"))
      .orderBy($"user_id")
  }

  private val q47Sql =
    """SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS updated_at
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** q52: SCD2 point-in-time read — the consumer side of the snapshot
    * machinery (q16 is the write side): reconstruct the dimension as it
    * was at time T by slicing the version intervals,
    * `valid_from <= T < coalesce(valid_to, +inf)`. Exactly one version
    * per key present at T survives; keys first seen after T are absent.
    * At scale this filter sits on top of the snapshot scan and prunes
    * with min/max stats on valid_from — no join, no shuffle.
    */
  def q52Scd2AsOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t0 = lit("1996-06-01 00:00:00").cast("timestamp")
    q16Scd2Snapshot(s, dir)
      .filter($"dbt_valid_from" <= t0 &&
        ($"dbt_valid_to".isNull || $"dbt_valid_to" > t0))
      .select($"custkey", $"status", $"totalprice",
        $"dbt_valid_from", $"dbt_valid_to")
      .orderBy($"custkey")
  }

  private val q52Sql =
    s"""SELECT custkey, status, totalprice, dbt_valid_from, dbt_valid_to
      |FROM (
      |$q16Sql
      |)
      |WHERE dbt_valid_from <= TIMESTAMP '1996-06-01 00:00:00'
      |  AND (dbt_valid_to IS NULL OR dbt_valid_to > TIMESTAMP '1996-06-01 00:00:00')
      |ORDER BY custkey""".stripMargin

  /** q124: SCD2 FACT ENRICHMENT — the third leg of the snapshot story
    * (q16 writes the history, q52 reads it at one instant; this joins
    * EVERY fact to the version valid at its own event time). Each
    * 1996-97 order picks its customer's dimension version via the
    * validity-interval predicate `valid_from <= t < coalesce(valid_to,
    * +inf)`; the intervals are disjoint by construction (q16's
    * supersede closes the old version at the new one's start), so at
    * most one version matches — asserted nowhere, PROVEN by the oracle
    * hash (a double-match would change row counts). Left join keeps
    * orders whose customer has no version yet. Per-key history is
    * version-count-sized, so the join fans out to |history per key|
    * candidates before the interval filter — the q36 time-binning (or
    * the q35 tagged-union as-of) is the swap-in when histories get
    * long; for dbt-style dimensions (a handful of versions per key)
    * the plain join IS the right plan.
    */
  def q124Scd2Enrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = q16Scd2Snapshot(s, dir)
      .select($"custkey", $"status".as("dim_status"),
        $"dbt_valid_from", $"dbt_valid_to")
    val facts = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    facts.join(hist,
        $"o_custkey" === $"custkey" &&
          $"dbt_valid_from" <= $"o_orderdate" &&
          ($"dbt_valid_to".isNull || $"o_orderdate" < $"dbt_valid_to"),
        "left")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate",
        $"dim_status", $"dbt_valid_from")
      .orderBy($"o_orderkey")
  }

  private val q124Sql =
    s"""WITH hist AS (
      |SELECT custkey, status AS dim_status, dbt_valid_from, dbt_valid_to
      |FROM (
      |$q16Sql
      |)),
      |facts AS (
      |  SELECT o_orderkey, o_custkey, o_orderdate
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |SELECT o_orderkey, o_custkey, o_orderdate, dim_status, dbt_valid_from
      |FROM facts LEFT JOIN hist
      |  ON o_custkey = custkey
      | AND dbt_valid_from <= o_orderdate
      | AND (dbt_valid_to IS NULL OR o_orderdate < dbt_valid_to)
      |ORDER BY o_orderkey""".stripMargin

  /** q129: incremental JOIN-delta maintenance — the bilinear expansion
    * Δ(A ⋈ B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, the algebra every materialized
    * join view (and every incremental pipeline stacked on S6's upsert)
    * relies on: when a batch of new orders (ΔA) and new customers (ΔB)
    * arrives, the view updates by joining only the DELTAS against the
    * old sides — never re-joining |A|x|B|. The oracle computes the same
    * delta the EXPENSIVE way (full recompute minus old result), so the
    * hash-equality IS the proof the expansion is lossless. At 100 TB
    * this is the difference between touching the delta (GBs) and
    * touching the view (the lake).
    */
  def q129JoinDelta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NB count is BILINEAR (delta-decomposable); count_distinct is NOT —
    // an old customer gaining a new order appears in both old and delta,
    // so a distinct over delta rows would not equal full minus old.
    val orders = t(s, dir, "orders").select($"o_orderkey", $"o_custkey",
      ($"o_orderdate" >= lit("1997-01-01").cast("timestamp")).as("isNew"))
    val aOld = orders.filter(!$"isNew").drop("isNew")
    val aNew = orders.filter($"isNew").drop("isNew")
    val cust = t(s, dir, "customer").select($"c_custkey", $"c_nationkey")
    val bOld = cust.filter($"c_custkey" % 10 =!= 0)
    val bNew = cust.filter($"c_custkey" % 10 === 0)
    val delta = aNew.join(bOld, $"o_custkey" === $"c_custkey")
      .unionByName(aOld.join(bNew, $"o_custkey" === $"c_custkey"))
      .unionByName(aNew.join(bNew, $"o_custkey" === $"c_custkey"))
    delta.groupBy($"c_nationkey")
      .agg(count(lit(1)).as("delta_pairs"))
      .orderBy($"c_nationkey")
  }

  private val q129Sql =
    """WITH a AS (
      |  SELECT o_orderkey, o_custkey,
      |    o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AS is_new
      |  FROM orders),
      |b AS (SELECT c_custkey, c_nationkey, c_custkey % 10 = 0 AS is_new
      |      FROM customer),
      |full_j AS (
      |  SELECT c_nationkey, o_custkey FROM a JOIN b ON o_custkey = c_custkey),
      |old_j AS (
      |  SELECT c_nationkey, o_custkey
      |  FROM a JOIN b ON o_custkey = c_custkey
      |  WHERE NOT a.is_new AND NOT b.is_new),
      |f AS (SELECT c_nationkey, count(*) AS n FROM full_j GROUP BY 1),
      |o AS (SELECT c_nationkey, count(*) AS n FROM old_j GROUP BY 1)
      |SELECT f.c_nationkey,
      |  CAST(f.n - coalesce(o.n, 0) AS BIGINT) AS delta_pairs
      |FROM f LEFT JOIN o ON f.c_nationkey = o.c_nationkey
      |WHERE f.n - coalesce(o.n, 0) > 0
      |ORDER BY f.c_nationkey""".stripMargin

  /** MERGE with SCHEMA EVOLUTION: the incoming batch may carry columns
    * the target has never seen (and vice versa); the merge aligns by
    * NAME, padding either side with typed NULLs — Delta's
    * `mergeSchema`/autoMerge contract, expressed as
    * `unionByName(allowMissingColumns)`. Evolution is add-only and
    * NULL-backfilled: history rows answer NULL for columns born later,
    * which is the lakehouse semantic (no rewrite of old files).
    */
  def upsertEvolve(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    existing.join(incoming, keys, "left_anti")
      .unionByName(incoming, allowMissingColumns = true)

  /** q248: the q15 MERGE under SCHEMA EVOLUTION — the 1997-98 incoming
    * batch ships a new `loyalty_tier` column the 1995-96 target never
    * had. [[upsertEvolve]] aligns by name: surviving pre-evolution rows
    * carry NULL tier (their files conceptually never rewritten), every
    * incoming row carries its computed tier. The oracle replays the
    * same algebra with an explicit NULL projection — so a merge that
    * dropped the new column, rewrote history, or misaligned the union
    * order all break the hash. Same single-shuffle anti-join plan as
    * q15; evolution costs nothing at any scale because it is pure
    * projection.
    */
  def q248UpsertEvolved(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val existing = custSummary(s, dir, "1995-01-01", "1997-01-01")
    val incoming = custSummary(s, dir, "1997-01-01", "1999-01-01")
      .withColumn("loyalty_tier",
        when($"total_spend" >= 1000000, "gold")
          .when($"total_spend" >= 300000, "silver")
          .otherwise("bronze"))
    upsertEvolve(existing, incoming, Seq("o_custkey")).orderBy($"o_custkey")
  }

  private val q248Sql =
    """WITH existing AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
      |    max(o_orderdate) AS last_order
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY o_custkey),
      |incoming AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
      |    max(o_orderdate) AS last_order,
      |    CASE WHEN CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |           >= 1000000 THEN 'gold'
      |         WHEN CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |           >= 300000 THEN 'silver'
      |         ELSE 'bronze' END AS loyalty_tier
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |  GROUP BY o_custkey)
      |SELECT * FROM (
      |  SELECT o_custkey, n_orders, total_spend, last_order,
      |    CAST(NULL AS VARCHAR) AS loyalty_tier
      |  FROM existing WHERE o_custkey NOT IN (SELECT o_custkey FROM incoming)
      |  UNION ALL
      |  SELECT * FROM incoming)
      |ORDER BY o_custkey""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q248_upsert_evolved", Seq("S6", "J4", "EXT-occ", "EXT-cdc"),
      "MERGE under schema evolution: name-aligned union with typed-NULL backfill for pre-evolution rows, single anti-join shuffle",
      q248UpsertEvolved, Some(q248Sql)),
    GraftQuery("q129_join_delta", Seq("S6", "J1", "A2", "EXT-incremental"),
      "bilinear join-delta maintenance proven against full recompute minus old",
      q129JoinDelta, Some(q129Sql)),
    GraftQuery("q124_scd2_enrich", Seq("S8", "P4", "J4", "EXT-timetravel"),
      "per-fact SCD2 enrichment: each order joined to its valid-at version",
      q124Scd2Enrich, Some(q124Sql)),
    GraftQuery("q52_scd2_asof", Seq("S8", "P4", "EXT-timetravel"),
      "SCD2 point-in-time dimension reconstruction",
      q52Scd2AsOf, Some(q52Sql)),
    GraftQuery("q15_upsert", Seq("S6", "J4"),
      "keyed upsert (incremental MERGE semantics)", q15Upsert, Some(q15Sql)),
    GraftQuery("q16_scd2_snapshot", Seq("S8", "A7", "J4", "P4"),
      "two-run SCD2 timestamp snapshot with hard-delete invalidation",
      q16Scd2Snapshot, Some(q16Sql)),
    GraftQuery("q47_cdc_apply", Seq("S6", "J4", "W2"),
      "CDC apply: latest-wins collapse + delete-op MERGE semantics",
      q47CdcApply, Some(q47Sql)))
}
