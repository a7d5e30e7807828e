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

  /** q243: HILBERT clustering — the same points, box, and report shape
    * as q138, with the Morton interleave replaced by the order-12
    * Hilbert curve (native [[graft.functions.NativeExpressions.HilbertIndex]]
    * expression — a generated per-row loop; the column-algebra form
    * would nest 2^12 conditionals). Hilbert's every step is an
    * axis-neighbor move, so consecutive curve positions are always
    * spatially adjacent — bucket bounding boxes come out tighter than
    * Morton's (whose bit-interleave takes long diagonal jumps at power
    * boundaries), and the SAME 2-D box predicate scans fewer buckets.
    * HilbertSpec pins that comparison (scanned(hilbert) ≤
    * scanned(morton)) plus the bijection; the oracle replays the
    * reflect-and-swap walk as 12 chained CTEs — per-level
    * MATERIALIZED columns, the same tree-explosion dodge in SQL form.
    */
  def q243HilbertSkipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val xy = t(s, dir, "orders").select(
      ($"o_custkey" % 4096).cast("int").as("x"),
      datediff(to_date($"o_orderdate"), to_date(lit("1992-01-01")))
        .cast("int").as("y"))
    xy.withColumn("h",
        graft.functions.NativeExpressions.hilbertIndex($"x", $"y", ZBits))
      .withColumn("bucket", shiftright($"h", BucketShift).cast("int"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_rows"),
        min($"x").as("min_x"), max($"x").as("max_x"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .withColumn("scanned",
        $"max_x" >= XLo && $"min_x" <= XHi &&
          $"max_y" >= YLo && $"min_y" <= YHi)
      .orderBy($"bucket")
  }

  private val q243Sql = {
    // one CTE per curve level: (x, y, d) rewritten by the reflect-and-
    // swap rotation with s = 2^lvl — columns materialize per CTE, so
    // neither engine builds the exponential nested-conditional tree
    def level(prev: String, out: String, lvl: Int): String = {
      val s = 1L << lvl
      s"""$out AS (
         |  SELECT x0, y0,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1
         |      THEN ${s - 1} - y ELSE y END ELSE x END AS x,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1
         |      THEN ${s - 1} - x ELSE x END ELSE y END AS y,
         |    d + ${s * s} * xor(3 * rx, ry) AS d
         |  FROM (SELECT x0, y0, x, y, d,
         |      CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |      CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
         |    FROM $prev))""".stripMargin
    }
    val chain = (0 until ZBits).reverse.zipWithIndex
      .map { case (lvl, i) => level(s"h$i", s"h${i + 1}", lvl) }
      .mkString(",\n")
    s"""WITH xy AS (
       |  SELECT CAST(o_custkey % 4096 AS INTEGER) AS x,
       |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
       |      AS INTEGER) AS y
       |  FROM orders),
       |h0 AS (SELECT x AS x0, y AS y0, CAST(x AS BIGINT) AS x,
       |  CAST(y AS BIGINT) AS y, CAST(0 AS BIGINT) AS d FROM xy),
       |$chain
       |SELECT CAST(bucket AS INTEGER) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  min(x0) AS min_x, max(x0) AS max_x,
       |  min(y0) AS min_y, max(y0) AS max_y,
       |  (max(x0) >= $XLo AND min(x0) <= $XHi AND
       |   max(y0) >= $YLo AND min(y0) <= $YHi) AS scanned
       |FROM (SELECT x0, y0, d >> $BucketShift AS bucket FROM h$ZBits)
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q138_zorder_skipping", Seq("EXT-olap", "A2"),
      "Z-order (Morton) clustering + per-bucket min/max stats: 2-D box pruning report",
      q138ZorderSkipping, Some(q138Sql)),
    GraftQuery("q243_hilbert_skipping", Seq("EXT-olap", "A2"),
      "Hilbert clustering via a generated-loop native expression: same box report as q138, tighter bucket boxes, fewer scanned buckets",
      q243HilbertSkipping, Some(q243Sql)))
}
