package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.pipeline.ParquetIO

/** Change data feed over [[ParquetIO]]'s retained version history — the
  * row-level diff surface (Delta Lake's CDF / Snowflake STREAMS shape)
  * that turns "time travel exists" into an operator: consumers read
  * WHAT changed between two committed versions instead of re-scanning
  * and re-deriving it. The reference's incremental models get exactly
  * this from Snowflake table streams implicitly (models/marts
  * incremental strategy, dbt_project.yml:38-49); here it is computed
  * from the immutable version directories the commit protocol already
  * retains.
  *
  * Plan shape at 100 TB: ONE full-outer shuffle join on the key across
  * the two versions (broadcast-able when one side is a small dimension;
  * AQE handles the skewed-key case), then a NARROW per-row explode of
  * at most two change records — no window, no second pass. The
  * null-safe struct comparison (`<=>` on a packed struct of non-key
  * columns) keeps "did anything change" a single codegen'd predicate
  * regardless of column count.
  */
object ChangeFeed {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Row-level diff `oldDf -> newDf` keyed by `keys`. Emits one row per
    * change with `_change_type` ∈ insert | delete | update_preimage |
    * update_postimage, carrying the full row image (post for inserts,
    * pre for deletes, both — as two rows — for updates). Unchanged keys
    * (null-safe equality over ALL non-key columns) emit nothing. Both
    * inputs must share the schema; key columns must be non-null (the
    * versioned-table contract this feed is defined over).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val valCols = oldDf.columns.filterNot(keys.contains).toSeq
    def packed(df: DataFrame, as: String): DataFrame =
      df.select((keys.map(col) :+ struct(valCols.map(col): _*).as(as)): _*)
    val o = packed(oldDf, "_pre")
    val n = packed(newDf, "_post")
    // In a full-outer join the non-matched side's packed struct is NULL
    // (whereas a present row's struct is never null, its fields at worst)
    // - presence and image ride one column per side.
    val changed = o.join(n, keys, "full_outer")
      .filter(!(col("_pre") <=> col("_post"))) // unchanged rows exit here
      .withColumn("_ops",
        when(col("_pre").isNull,
          array(struct(lit("insert").as("t"), col("_post").as("img"))))
        .when(col("_post").isNull,
          array(struct(lit("delete").as("t"), col("_pre").as("img"))))
        .otherwise(array(
          struct(lit("update_preimage").as("t"), col("_pre").as("img")),
          struct(lit("update_postimage").as("t"), col("_post").as("img")))))
      .select(keys.map(col) :+ explode(col("_ops")).as("_op"): _*)
    val out: Seq[Column] = (col("_op.t").as("_change_type") +:
      keys.map(col)) ++ valCols.map(c => col(s"_op.img.`$c`").as(c))
    changed.select(out: _*)
  }

  /** [[diff]] between two retained versions of a [[ParquetIO]] table —
    * the time-travel read made consumable.
    */
  def between(s: SparkSession, dir: String, fromV: Long, toV: Long,
      keys: Seq[String]): DataFrame =
    diff(ParquetIO.readVersion(s, dir, fromV),
      ParquetIO.readVersion(s, dir, toV), keys)

  /** q174: the feed end-to-end through real table versions. Two
    * deterministic states of a customer dimension are committed as v1
    * and v2 (the GC retain window keeps both), chosen so every change
    * type occurs: keys in v2 only (`%7=0` excluded from v1) → insert,
    * keys in v1 only (`%5=0` excluded from v2) → delete, keys in both
    * with `%3=0` carrying a +100 balance adjustment → update pre+post
    * pairs, everything else unchanged and silent. The oracle computes
    * the identical diff relationally from the source table — a feed
    * that misses, duplicates, or mis-images any row breaks the hash.
    */
  def q174ChangeFeed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
    val oldState = cust.filter($"c_custkey" % 7 =!= 0)
      .select($"c_custkey", $"c_mktsegment".as("segment"), $"c_acctbal".as("bal"))
    val newState = cust.filter($"c_custkey" % 5 =!= 0)
      .select($"c_custkey", $"c_mktsegment".as("segment"),
        when($"c_custkey" % 3 === 0, $"c_acctbal" + 100d)
          .otherwise($"c_acctbal").as("bal"))
    val tmp = Files.createTempDirectory("graft-q174").resolve("cust").toString
    ParquetIO.overwriteSwap(oldState, tmp) // v1
    ParquetIO.overwriteSwap(newState, tmp) // v2; GcRetain keeps v1
    val out = between(s, tmp, 1L, 2L, Seq("c_custkey"))
      .orderBy($"c_custkey", $"_change_type")
    // materialize (bounded: O(changed keys)) before the temp table goes
    val rows = out.collect()
    rmTree(java.nio.file.Paths.get(tmp).getParent)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  private def rmTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))

  private val q174Sql =
    """WITH oldv AS (
      |  SELECT c_custkey, c_mktsegment AS segment, c_acctbal AS bal
      |  FROM customer WHERE c_custkey % 7 <> 0),
      |newv AS (
      |  SELECT c_custkey, c_mktsegment AS segment,
      |    CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS bal
      |  FROM customer WHERE c_custkey % 5 <> 0),
      |j AS (
      |  SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
      |    o.segment AS oseg, o.bal AS obal, n.segment AS nseg, n.bal AS nbal,
      |    o.c_custkey IS NOT NULL AS has_o, n.c_custkey IS NOT NULL AS has_n
      |  FROM oldv o FULL OUTER JOIN newv n ON o.c_custkey = n.c_custkey),
      |upd AS (
      |  SELECT * FROM j WHERE has_o AND has_n AND
      |    (oseg IS DISTINCT FROM nseg OR obal IS DISTINCT FROM nbal))
      |SELECT 'insert' AS _change_type, c_custkey, nseg AS segment, nbal AS bal
      |FROM j WHERE NOT has_o
      |UNION ALL
      |SELECT 'delete', c_custkey, oseg, obal FROM j WHERE NOT has_n
      |UNION ALL
      |SELECT 'update_preimage', c_custkey, oseg, obal FROM upd
      |UNION ALL
      |SELECT 'update_postimage', c_custkey, nseg, nbal FROM upd
      |ORDER BY c_custkey, _change_type""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q174_change_feed", Seq("S7", "S6", "EXT-occ", "EXT-streaming"),
      "change data feed between two retained table versions: full-outer key diff exploded into insert/delete/update pre+post images",
      q174ChangeFeed, Some(q174Sql)))
}
