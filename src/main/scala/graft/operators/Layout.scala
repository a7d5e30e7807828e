package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Write-side DATA LAYOUT operators — the decisions that make 100 TB
  * readable. Partition pruning (PartitionPruningSpec) and bucketing
  * (BucketingSpec) cover the 1-D cases; Z-ORDER clustering is the
  * multi-dimensional one: interleave the bits of two scan dimensions so
  * that rows close in (x, y) land in the same file, and every file's
  * min/max footer stats then prune a 2-D box predicate — the Delta
  * OPTIMIZE ZORDER / Iceberg sort-order idea, reproduced with plain
  * arithmetic so the mechanism itself is oracle-checkable.
  */
object Layout {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Bits per dimension; z takes 2*ZBits, the top 6 select 64 buckets. */
  val ZBits = 12
  private val BucketShift = 2 * ZBits - 6

  // the 2-D box query the stats are judged against (power-of-two aligned
  // so bucket boundaries genuinely matter)
  private val XLo = 256
  private val XHi = 511
  private val YLo = 1024
  private val YHi = 2047

  /** Morton spread: bit i of v moves to bit 2i — plain shift/and/multiply
    * arithmetic (codegen'd; identical in DuckDB), no UDF.
    */
  private def spread(c: Column): Column =
    (0 until ZBits).map(i =>
      shiftright(c, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i)))
      .reduce(_ + _)

  /** q138: Z-order clustering effectiveness report. Each order maps to
    * (x, y) = (custkey mod 4096, order-date day number), z = interleaved
    * bits, bucket = top-6 z bits (the "file" a z-sorted writer would
    * place the row in — on a real lake this is
    * `repartitionByRange(z).sortWithinPartitions(z)` before the write;
    * here the bucket id is computed relationally so the oracle can check
    * the layout math itself). Per bucket: row count, min/max of both
    * dimensions (exactly the parquet footer stats a reader consults),
    * and whether the benchmark 2-D box query would have to SCAN the
    * bucket (its [min,max]×[min,max] envelope intersects the box). The
    * interleaving is the whole point: sorted by custkey alone, a date
    * predicate touches every file; z-sorted, BOTH predicates prune —
    * the scanned-bucket fraction in this report is the fraction of the
    * lake the box query reads.
    */
  def q138ZorderSkipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val xy = t(s, dir, "orders").select(
      ($"o_custkey" % 4096).cast("int").as("x"),
      datediff(to_date($"o_orderdate"), to_date(lit("1992-01-01")))
        .cast("int").as("y"))
    xy.withColumn("z", spread($"x") + spread($"y") * 2)
      .withColumn("bucket", shiftright($"z", BucketShift).cast("int"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_rows"),
        min($"x").as("min_x"), max($"x").as("max_x"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .withColumn("scanned",
        $"max_x" >= XLo && $"min_x" <= XHi &&
          $"max_y" >= YLo && $"min_y" <= YHi)
      .orderBy($"bucket")
  }

  private val q138Sql = {
    def spreadSql(col: String) = (0 until ZBits)
      .map(i => s"((($col >> $i) & 1) * ${1L << (2 * i)})")
      .mkString(" + ")
    s"""WITH xy AS (
      |  SELECT CAST(o_custkey % 4096 AS INTEGER) AS x,
      |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
      |      AS INTEGER) AS y
      |  FROM orders),
      |zb AS (
      |  SELECT x, y,
      |    ((${spreadSql("x")}) + (${spreadSql("y")}) * 2) >> $BucketShift
      |      AS bucket
      |  FROM xy)
      |SELECT CAST(bucket AS INTEGER) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  min(x) AS min_x, max(x) AS max_x,
      |  min(y) AS min_y, max(y) AS max_y,
      |  (max(x) >= $XLo AND min(x) <= $XHi AND
      |   max(y) >= $YLo AND min(y) <= $YHi) AS scanned
      |FROM zb
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q138_zorder_skipping", Seq("EXT-olap", "A2"),
      "Z-order (Morton) clustering + per-bucket min/max stats: 2-D box pruning report",
      q138ZorderSkipping, Some(q138Sql)))
}
