package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftQuery, Tables}

/** Round-4 data-ops audit family: the whole-schema checks a warehouse
  * runs after every load (the reference's dbt tests check ONE
  * relationship per YAML entry — reference models/staging YAML files;
  * these generalize that to the full star programmatically), plus
  * sample-based approximate aggregation with a confidence interval —
  * the "answer at 1% of the cost" query pattern that makes a 100-TB
  * warehouse interactively explorable.
  */
object Audit {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** The star schema's FK edges: (child table, fk col, parent table, pk). */
  private val FkEdges = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** q116: whole-star referential-integrity audit — one row per FK edge
    * with child row count, distinct FK values, and orphan count (child
    * values absent from the parent). The edge list is declared DATA, so
    * the audit is schema-driven like q100's profile: adding a table to
    * the warehouse adds one tuple here, not a hand-written test. Each
    * edge costs one left-anti join (broadcast for dimension parents,
    * shuffle for fact-fact); the per-edge results are 1-row aggregates
    * unioned together — at 100 TB the edges run as independent jobs and
    * the report stays 7 rows.
    */
  def q116FkAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perEdge = FkEdges.map { case (child, fk, parent, pk) =>
      val c = t(s, dir, child).select(col(fk).as("fkv"))
      val p = t(s, dir, parent).select(col(pk).as("pkv"))
      // NULL FKs are reported in n_null_fk, NOT as orphans: a bare
      // left_anti would also keep NULL rows (fkv === pkv is null-false)
      // and double-count them in both columns — diverging from the
      // oracle's `fk IS NOT NULL AND fk NOT IN (parent)` definition.
      val orphans = c.filter($"fkv".isNotNull)
        .join(p, $"fkv" === $"pkv", "left_anti")
      val stats = c.agg(
        count(lit(1)).as("n_child"),
        count_distinct($"fkv").as("n_distinct_fk"),
        sum(when($"fkv".isNull, 1L).otherwise(0L)).as("n_null_fk"))
      stats.crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(s"$child.$fk -> $parent.$pk").as("edge"),
          $"n_child", $"n_distinct_fk", $"n_null_fk", $"n_orphans")
    }
    perEdge.reduce(_ unionByName _).orderBy($"edge")
  }

  private val q116Sql = FkEdges.map { case (child, fk, parent, pk) =>
    s"""SELECT '$child.$fk -> $parent.$pk' AS edge,
       |  CAST(count(*) AS BIGINT) AS n_child,
       |  CAST(count(DISTINCT $fk) AS BIGINT) AS n_distinct_fk,
       |  CAST(sum(CASE WHEN $fk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_null_fk,
       |  CAST(sum(CASE WHEN $fk IS NOT NULL
       |    AND $fk NOT IN (SELECT $pk FROM $parent) THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_orphans
       |FROM $child""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY edge")

  private val SampleRate = 0.1

  /** q114: sample-based approximate aggregation with a 95% confidence
    * interval — mean order value per status, estimated from a 10%
    * DETERMINISTIC hash sample (the q50/q101 no-RNG draw) and reported
    * next to the exact answer with a within-CI verdict. This is the
    * interactive-exploration contract at 100 TB — with one honesty
    * note: a hash-expression filter is NOT parquet-pushable, so the
    * scan still reads every row; the 90% saving is everything
    * DOWNSTREAM (shuffle, aggregation, memory). To cut the IO too, the
    * sample key must be in the LAYOUT (a bucketed/partitioned sample
    * column), which is a write-side decision this query deliberately
    * doesn't assume. Because the sample is hash-determined the estimate
    * is reproducible (an RNG sample would make the oracle
    * unverifiable). CI half-width =
    * 1.96 * s/sqrt(n) from the SAME sufficient statistics q108/q110 use;
    * all sums exact DECIMAL, comparisons on rounded values only.
    */
  def q114SampleEstimate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = conv(substring(md5(concat(lit("est"), $"o_orderkey".cast("string"))),
      1, 8), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    val o = t(s, dir, "orders").select($"o_orderstatus",
      $"o_totalprice".cast(DecimalType(19, 2)).as("v"), u.as("u"))
    val sample = o.filter($"u" < SampleRate).groupBy($"o_orderstatus").agg(
      count(lit(1)).as("n_sample"),
      sum($"v").cast("double").as("sv"),
      sum($"v" * $"v").cast("double").as("svv"))
    val exact = o.groupBy($"o_orderstatus").agg(
      round(sum($"v").cast("double") / count(lit(1)), 4).as("exact_mean"))
    // exact LEFT JOIN sample: a stratum the hash draw missed entirely
    // still appears (n_sample=0, null estimate) — an audit must never
    // silently drop a group. CI guarded to n_sample > 1: a 1-row
    // stratum has no variance estimate, so it reports null, not NaN.
    exact.join(sample, Seq("o_orderstatus"), "left")
      .withColumn("n_sample", coalesce($"n_sample", lit(0L)))
      .withColumn("est_mean", when($"n_sample" > 0, $"sv" / $"n_sample"))
      .withColumn("ci_half",
        when($"n_sample" > 1,
          lit(1.96) * sqrt(($"svv" - $"sv" * $"sv" / $"n_sample") /
            ($"n_sample" - 1) / $"n_sample")))
      .select($"o_orderstatus", $"n_sample",
        round($"est_mean", 4).as("est_mean"),
        round($"ci_half", 4).as("ci_half"),
        $"exact_mean",
        (abs($"est_mean" - $"exact_mean") <= $"ci_half").as("within_ci"))
      .orderBy($"o_orderstatus")
  }

  private val q114Sql =
    s"""WITH o AS (
      |  SELECT o_orderstatus, CAST(o_totalprice AS DECIMAL(19,2)) AS v,
      |    (('0x' || substr(md5('est' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
      |      + 0.5e0) / 4294967296e0 AS u
      |  FROM orders),
      |smp AS (
      |  SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_sample,
      |    CAST(sum(v) AS DOUBLE) AS sv, CAST(sum(v * v) AS DOUBLE) AS svv
      |  FROM o WHERE u < $SampleRate GROUP BY 1),
      |ex AS (
      |  SELECT o_orderstatus,
      |    round(CAST(sum(v) AS DOUBLE) / count(*), 4) AS exact_mean
      |  FROM o GROUP BY 1),
      |j AS (
      |  SELECT o_orderstatus, coalesce(n_sample, 0) AS n_sample,
      |    CASE WHEN n_sample > 0 THEN sv / n_sample END AS est_mean,
      |    CASE WHEN n_sample > 1 THEN
      |      1.96e0 * sqrt((svv - sv * sv / n_sample) / (n_sample - 1) / n_sample)
      |    END AS ci_half,
      |    exact_mean
      |  FROM ex LEFT JOIN smp USING (o_orderstatus))
      |SELECT o_orderstatus, n_sample, round(est_mean, 4) AS est_mean,
      |  round(ci_half, 4) AS ci_half, exact_mean,
      |  (abs(est_mean - exact_mean) <= ci_half) AS within_ci
      |FROM j
      |ORDER BY o_orderstatus""".stripMargin

  /** q115: ordered ARRAY aggregation — each supplier's top-3 part
    * brands by shipped quantity as a LIST column (the "API answer"
    * shape: one row per entity, ranked list inline). Determinism:
    * quantities reduce as exact decimals, ranks tie-break on brand, and
    * the list is built from the already-ranked rows — both engines
    * produce the identical array. One aggregation + one window; the
    * array stays bounded (k=3) so the row is O(k) at any scale.
    */
  def q115TopBrandArray(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qty = t(s, dir, "lineitem")
      .join(t(s, dir, "part").select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey", $"p_brand")
      .agg(sum($"l_quantity".cast(DecimalType(18, 2))).as("qty"))
    val w = Window.partitionBy($"l_suppkey").orderBy($"qty".desc, $"p_brand".asc)
    qty.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .groupBy($"l_suppkey")
      .agg(sort_array(collect_list(struct($"rn", $"p_brand"))).as("ranked"))
      .select($"l_suppkey".as("suppkey"),
        // pipe-joined, not a LIST column: the driver's compare hashes
        // stringified cells, and list renderings differ across engines
        array_join(transform($"ranked", r => r.getField("p_brand")), "|")
          .as("top_brands"))
      .orderBy($"suppkey")
  }

  private val q115Sql =
    """WITH qty AS (
      |  SELECT l_suppkey, p_brand,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
      |    ORDER BY qty DESC, p_brand ASC) AS rn
      |  FROM qty)
      |SELECT l_suppkey AS suppkey,
      |  array_to_string(list(p_brand ORDER BY rn), '|') AS top_brands
      |FROM r WHERE rn <= 3
      |GROUP BY l_suppkey
      |ORDER BY suppkey""".stripMargin

  /** q117: per-table content checksums — an order-free, distribution-
    * free fingerprint (sum of the first-8-hex md5 of each row's key
    * column, as BIGINT mod nothing — addition commutes, so partitioning
    * and row order can't change it) plus row counts, one row per table.
    * The cheap answer to "did replication/backfill change anything?"
    * before q97's row-level diff is worth running; at 100 TB each
    * checksum is a scan-local map + one scalar reduce.
    */
  def q117TableChecksums(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyOf = Map(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey")
    val perTable = keyOf.toSeq.sortBy(_._1).map { case (tbl, key) =>
      t(s, dir, tbl).agg(
          count(lit(1)).as("n_rows"),
          sum(conv(substring(md5(col(key).cast("string")), 1, 8), 16, 10)
            .cast("long")).as("key_checksum"))
        .select(lit(tbl).as("table_name"), $"n_rows", $"key_checksum")
    }
    perTable.reduce(_ unionByName _).orderBy($"table_name")
  }

  private val q117Sql = Seq(
    ("customer", "c_custkey"), ("nation", "n_nationkey"),
    ("orders", "o_orderkey"), ("part", "p_partkey"),
    ("region", "r_regionkey"), ("supplier", "s_suppkey"))
    .map { case (tbl, key) =>
      s"""SELECT '$tbl' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8))::BIGINT)
         |    AS BIGINT) AS key_checksum
         |FROM $tbl""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")

  /** q118: keyset pagination — page 3 (rows 41..60) of the orders feed
    * ordered by (o_totalprice DESC, o_orderkey ASC), fetched the
    * SCALABLE way: a WHERE predicate on the last key of page 2 plus
    * LIMIT, not OFFSET. OFFSET must materialize and discard every
    * preceding row on every page (page N costs O(N) — the deep-
    * pagination death at warehouse scale); the keyset predicate pushes
    * into the scan and each page costs the same. The oracle states the
    * equivalence with the OFFSET formulation — proving the rewrite
    * returns the identical page.
    */
  def q118KeysetPage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    // page boundary: the 40th row under the total order (2 pages x 20
    // rows). Computed as two TakeOrderedAndProjects — top-40 heap per
    // task, then the last of those 40 — NOT a global row_number, which
    // would be the exact O(N) single-partition sort this query's whole
    // point is to avoid.
    val boundary = ord
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc).limit(40)
      .orderBy($"o_totalprice".asc, $"o_orderkey".desc).limit(1)
      .select($"o_totalprice".as("b_price"), $"o_orderkey".as("b_key"))
    ord.crossJoin(broadcast(boundary))
      .filter($"o_totalprice" < $"b_price" ||
        ($"o_totalprice" === $"b_price" && $"o_orderkey" > $"b_key"))
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(20)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  private val q118Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 20 OFFSET 40""".stripMargin

  /** q119: time-weighted average (TWAP) — per event type, the mean of
    * `value` weighted by how long it was "current" (until the next
    * event of that type), the correct average for irregularly-sampled
    * series (a plain mean overweights bursts). dt comes from lead()
    * in integer MICROSECONDS; the value x dt products are exact
    * decimals (value carries 2 decimals, dt is integral), so the final
    * divide is one deterministic double op. One shuffle on the series
    * key, one window — the irregular-series integral at any scale.
    */
  def q119Twap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"us".asc, $"event_id".asc)
    val ev = t(s, dir, "events")
      .select($"event_type", $"event_id", $"value".cast(DecimalType(9, 2)).as("v"),
        unix_micros($"ts").as("us"))
      .withColumn("dt", lead($"us", 1).over(w) - $"us")
      .filter($"dt".isNotNull)
    ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n_intervals"),
        sum($"dt").as("total_us"),
        round(sum($"v" * $"dt").cast("double") / sum($"dt"), 6).as("twap"),
        round(sum($"v").cast("double") / count(lit(1)), 6).as("plain_mean"))
      .orderBy($"event_type")
  }

  private val q119Sql =
    """WITH ev AS (
      |  SELECT event_type, event_id, CAST(value AS DECIMAL(19,2)) AS v,
      |    epoch_us(ts) AS us,
      |    lead(epoch_us(ts), 1) OVER (PARTITION BY event_type
      |      ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS dt
      |  FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
      |  CAST(sum(dt) AS BIGINT) AS total_us,
      |  round(CAST(sum(v * dt) AS DOUBLE) / sum(dt), 6) AS twap,
      |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS plain_mean
      |FROM ev WHERE dt IS NOT NULL
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q114_sample_estimate", Seq("A2", "EXT-approx"),
      "CI-bounded mean from a 10% deterministic hash sample vs exact",
      q114SampleEstimate, Some(q114Sql)),
    GraftQuery("q115_top_brand_array", Seq("A2", "W2", "P5"),
      "ordered top-3 array aggregation per supplier (API answer shape)",
      q115TopBrandArray, Some(q115Sql)),
    GraftQuery("q116_fk_audit", Seq("J3", "P6", "A2"),
      "schema-driven referential-integrity audit over every FK edge",
      q116FkAudit, Some(q116Sql)),
    GraftQuery("q117_table_checksums", Seq("A1", "F12"),
      "order-free per-table content checksums (replication fingerprint)",
      q117TableChecksums, Some(q117Sql)),
    GraftQuery("q118_keyset_pagination", Seq("P1", "W2"),
      "keyset pagination page-3 fetch, OFFSET-equivalence oracle-proven",
      q118KeysetPage, Some(q118Sql)),
    GraftQuery("q119_twap", Seq("W1", "A2"),
      "time-weighted average over irregular series (lead-dt integration)",
      q119Twap, Some(q119Sql)))
}
