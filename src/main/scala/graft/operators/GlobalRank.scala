package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Exact global ranking WITHOUT the single-partition sort.
  *
  * `row_number().over(Window.orderBy(...))` is the classic scale killer:
  * Spark plans an empty-partitionSpec window as Exchange SinglePartition
  * plus a full sort on ONE task, so the whole table funnels through one
  * executor. But a global rank does not need a global funnel — it is
  * range partitioning (the same parallel exchange a global `orderBy`
  * uses) plus per-partition local ranks plus the cumulative row-count
  * offset of every preceding partition. The offsets are one P-row
  * aggregate (P = shuffle partitions — never data-scaled), the local
  * ranks are an ordinary partitioned window, and every stage is fully
  * parallel. This is the Spark re-expression of the "zipWithIndex"
  * technique, kept inside the DataFrame API so codegen and AQE still
  * apply.
  *
  * Requirement: the sort key must be UNIQUE per row (callers add a
  * tie-break column) — range partitioning splits on key-value
  * boundaries, and a duplicated key straddling two partitions would
  * otherwise make local ranks ambiguous.
  */
object GlobalRank {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** df plus a `rankCol` BIGINT column holding the exact 1-based
    * row_number under `order`, computed with range partitioning + a
    * P-row offset table instead of a single-partition window.
    */
  def withGlobalRank(df: DataFrame, rankCol: String, order: Column*): DataFrame =
    withGlobalRankCounted(df, rankCol, order: _*)._1

  /** [[withGlobalRank]] plus the TOTAL row count, which the offset
    * bookkeeping computes anyway (last cumulative offset) — callers that
    * need n (decile cuts, top-percent flags) get it without an extra
    * counting job over the input.
    */
  def withGlobalRankCounted(df: DataFrame, rankCol: String,
      order: Column*): (DataFrame, Long) = {
    val s = df.sparkSession
    import s.implicits._
    val parts = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    // one row per non-empty partition — the only driver-side data
    val counts = parts.groupBy($"__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val maxPid = if (counts.isEmpty) 0 else counts.keys.max
    val offsets = (0 to maxPid).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offDf = (0 to maxPid).map(p => (p, offsets(p))).toDF("__pid", "__off")
    val w = Window.partitionBy($"__pid").orderBy(order: _*)
    val ranked = parts.withColumn("__rn", row_number().over(w))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(rankCol, $"__off" + $"__rn")
      .drop("__pid", "__rn", "__off")
    // Bounded cache accounting: the offset map is valid only against
    // THIS materialized range shuffle, so `parts` must stay cached for
    // as long as the ranked result may be re-executed (unpersisting
    // earlier would re-plan the raw repartitionByRange with freshly
    // sampled boundaries and silently shift ranks — including on a
    // SECOND action over the same returned DataFrame). So each new
    // withGlobalRank call releases the PREVIOUS call's cache instead:
    // at most one range shuffle stays pinned at any time (the 157-query
    // drivers' per-query clearCache() remains the final backstop), and
    // the most recent ranked result stays consistent across repeated
    // actions.
    GlobalRank.synchronized {
      lastParts.foreach(_.unpersist(false))
      lastParts = Some(parts)
    }
    (ranked, offsets.last)
  }

  // the one pinned range shuffle from the most recent withGlobalRank call
  private var lastParts: Option[DataFrame] = None

  /** df plus exact global running (inclusive) sums of the given LONG
    * columns under `order` — the prefix-scan analogue of
    * [[withGlobalRank]], same device: range partitioning, ordinary
    * per-partition window sums, and a P-row table of per-partition
    * totals scanLeft'd on the driver into additive offsets (P =
    * shuffle partitions — never data-scaled). This is the scale-safe
    * form of `sum(x).over(Window.orderBy(...))`, which Spark would
    * plan as Exchange SinglePartition — and cumulative sums under a
    * global order are the global-CDF / running-ledger workhorse (KS
    * statistics, CUSUM series, quantile tables). A ones-column input
    * degenerates to [[withGlobalRank]] itself (a prefix sum of 1s IS
    * the global row number). `cums` maps source column → new
    * cumulative column name. Same unique-sort-key requirement and
    * pinned-cache contract as withGlobalRank (shares the one-slot
    * cache).
    */
  def withGlobalPrefixSums(df: DataFrame, cums: Seq[(String, String)],
      order: Column*): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val parts = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    // one row per non-empty partition, one long per summed column
    val aggs = cums.map { case (src, _) => sum(col(src)).as(s"__t_$src") }
    val byPid = parts.groupBy($"__pid").agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> cums.indices.map(i => r.getLong(i + 1)))
      .toMap
    val maxPid = if (byPid.isEmpty) 0 else byPid.keys.max
    val zero: Seq[Long] = cums.map(_ => 0L)
    val offsets = (0 to maxPid).scanLeft(zero) { (acc, p) =>
      acc.lazyZip(byPid.getOrElse(p, zero)).map(_ + _)
    }
    val offDf = (0 to maxPid).map(p => (p, offsets(p))).toDF("__pid", "__offs")
    val w = Window.partitionBy($"__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = cums.zipWithIndex.foldLeft(
        parts.join(broadcast(offDf), Seq("__pid"))) {
      case (d, ((src, dst), i)) =>
        d.withColumn(dst, sum(col(src)).over(w) + $"__offs".getItem(i))
    }.drop("__pid", "__offs")
    GlobalRank.synchronized {
      lastParts.foreach(_.unpersist(false))
      lastParts = Some(parts)
    }
    out
  }

  /** q132: exact global ranking of every order by price — the operator
    * above, oracle-checked against DuckDB's `row_number() OVER (ORDER
    * BY ...)`. The rank column in the result is bit-identical to the
    * single-partition formulation while the plan stays parallel end to
    * end: a wrong offset for ANY partition would shift every rank after
    * it, so the full-table hash compare is a strong proof of the
    * offset bookkeeping.
    */
  def q132GlobalRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
    withGlobalRank(o, "rnk", $"o_totalprice".desc, $"o_orderkey".asc)
      .select($"rnk", $"o_orderkey", $"o_totalprice")
      .orderBy($"rnk")
  }

  private val q132Sql =
    """SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
      |    AS BIGINT) AS rnk,
      |  o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY rnk""".stripMargin

  /** q155: join-key skew profile — the optimizer statistic q144's size
    * estimate doesn't carry: HOW a key's mass is distributed, which is
    * what decides salting (q34/q57), AQE skew thresholds, and broadcast
    * cutoffs before a 100-TB join is launched. One keyed aggregation
    * collapses the fact table to the key-count table; the EXACT Gini
    * coefficient then needs every count's global rank — computed with
    * [[withGlobalRank]] (range partitioning + offsets), so the profile
    * has NO single-partition sort even when the key domain itself is
    * huge. Everything stays integer until the two final divisions:
    * Gini = (2·Σrank·cnt − (n+1)·Σcnt) / (n·Σcnt), the rank-form
    * identity. The heavy key rides the same aggregate as a struct-max
    * (count desc, key asc tiebreak).
    */
  def q155SkewProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)).as("cnt"))
    val ranked = withGlobalRank(counts, "rnk", $"cnt".asc, $"o_custkey".asc)
    ranked.agg(
        count(lit(1)).as("n_keys"),
        sum($"cnt").as("n_rows"),
        max(struct($"cnt", (-$"o_custkey").as("negkey"))).as("m"),
        sum($"rnk" * $"cnt").as("src"))
      .select($"n_keys", $"n_rows",
        $"m.cnt".as("max_cnt"), (-$"m.negkey").cast("bigint").as("top_key"),
        round($"m.cnt".cast("double") / $"n_rows", 6).as("max_share"),
        round((lit(2.0) * $"src" - ($"n_keys" + 1).cast("double") * $"n_rows") /
          ($"n_keys".cast("double") * $"n_rows"), 6).as("gini"))
  }

  private val q155Sql =
    """WITH c AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY cnt ASC, o_custkey ASC)
      |    AS BIGINT) AS rnk
      |  FROM c),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |    CAST(sum(cnt) AS BIGINT) AS n_rows,
      |    CAST(sum(rnk * cnt) AS BIGINT) AS src
      |  FROM r)
      |SELECT n_keys, n_rows,
      |  (SELECT cnt FROM c ORDER BY cnt DESC, o_custkey ASC LIMIT 1) AS max_cnt,
      |  (SELECT o_custkey FROM c ORDER BY cnt DESC, o_custkey ASC LIMIT 1)
      |    AS top_key,
      |  round(CAST((SELECT cnt FROM c ORDER BY cnt DESC, o_custkey ASC LIMIT 1)
      |    AS DOUBLE) / n_rows, 6) AS max_share,
      |  round((2e0 * src - CAST(n_keys + 1 AS DOUBLE) * n_rows) /
      |    (CAST(n_keys AS DOUBLE) * n_rows), 6) AS gini
      |FROM a""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q132_global_rank", Seq("W1", "W2", "EXT-olap"),
      "exact global row_number via range partitioning + offsets, no single-partition sort",
      q132GlobalRank, Some(q132Sql)),
    GraftQuery("q155_skew_profile", Seq("A2", "EXT-skew", "EXT-olap"),
      "join-key skew profile: exact rank-form Gini via range-partitioned global rank, heavy-key struct-max",
      q155SkewProfile, Some(q155Sql)))
}
