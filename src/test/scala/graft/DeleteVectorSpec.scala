package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.ParquetIO

/** Merge-on-read deletion vectors: positional deletes from the parquet
  * `_metadata` columns, subtraction at read time, and — the part that
  * keeps the contract safe — materialization/rebase through every path
  * that creates a new version (compaction, optimistic read-modify-
  * write, hard-linked append). A deleted row must NEVER resurrect.
  */
class DeleteVectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(tag: String, n: Int = 100, parts: Int = 4): String = {
    val dir = Files.createTempDirectory(s"graft-dv-$tag").resolve("t").toString
    ParquetIO.overwriteSwap(
      spark.range(n).toDF("k").withColumn("v", $"k" * 2).repartition(parts), dir)
    dir
  }

  private def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  test("deleteWhere + readMoR: rows vanish, files untouched, plain read still full") {
    val dir = freshTable("basic")
    val n = ParquetIO.deleteWhere(spark, dir, $"k" % 10 === 0)
    assert(n == 10)
    assert(keys(ParquetIO.readMoR(spark, dir)) == (0L until 100L).filter(_ % 10 != 0).toSet)
    // merge-on-read: the base version still physically holds every row
    assert(ParquetIO.read(spark, dir).count() == 100)
    assert(ParquetIO.deleteRatio(spark, dir) == 0.10)
  }

  test("overlapping predicates accumulate idempotently") {
    val dir = freshTable("overlap")
    ParquetIO.deleteWhere(spark, dir, $"k" < 20)
    ParquetIO.deleteWhere(spark, dir, $"k" % 2 === 0) // overlaps 0,2,...,18
    assert(keys(ParquetIO.readMoR(spark, dir)) ==
      (0L until 100L).filter(k => k >= 20 && k % 2 != 0).toSet)
    assert(ParquetIO.deleteRatio(spark, dir) == 0.60)
  }

  test("compact materializes vectors — deletes survive the rewrite, vectors retire") {
    val dir = freshTable("compact", parts = 8)
    ParquetIO.deleteWhere(spark, dir, $"k" >= 50)
    val stats = ParquetIO.compact(spark, dir, targetBytes = 1L << 30)
    assert(stats.versionAfter > stats.versionBefore)
    // physically materialized: the new version holds ONLY survivors
    assert(ParquetIO.read(spark, dir).count() == 50)
    assert(keys(ParquetIO.readMoR(spark, dir)) == (0L until 50L).toSet)
    assert(ParquetIO.deleteRatio(spark, dir) == 0.0, "old vectors must not bind to the new version")
  }

  test("transformConcurrent sees the MoR view and materializes on commit") {
    val dir = freshTable("rmw")
    ParquetIO.deleteWhere(spark, dir, $"k" < 90)
    ParquetIO.transformConcurrent(spark, dir) {
      case Some(base) => base.withColumn("v", $"v" + 1)
      case None       => fail("base must exist")
    }
    // 10 surviving rows, transformed; deleted rows did not resurrect
    val rows = ParquetIO.read(spark, dir).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == (90L until 100L).toSet)
    assert(rows(90L) == 181L)
  }

  test("upsertMoR: O(batch) MERGE — newest image wins across composed upserts, inserts land") {
    val dir = freshTable("upsert")
    // batch 1: update evens, insert 200..204
    ParquetIO.upsertMoR(spark, dir,
      spark.range(0, 100, 2).toDF("k").withColumn("v", $"k" * 10)
        .unionByName(spark.range(200, 205).toDF("k").withColumn("v", lit(-1L))),
      Seq("k"))
    // batch 2 overlaps: re-update multiples of 10 (wins over batch 1)
    ParquetIO.upsertMoR(spark, dir,
      spark.range(0, 100, 10).toDF("k").withColumn("v", $"k" * 100), Seq("k"))
    val rows = ParquetIO.readMoR(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == 105)
    assert(rows(10L) == 1000L, "second upsert must supersede the first")
    assert(rows(2L) == 20L, "first upsert's non-overlapped keys survive")
    assert(rows(3L) == 6L, "untouched keys keep the base image")
    assert(rows(200L) == -1L, "inserts land")
    // a compaction materializes everything and the content is unchanged
    ParquetIO.compact(spark, dir, targetBytes = 1L << 30)
    val after = ParquetIO.readMoR(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == rows, "compaction must preserve the merged content")
    assert(ParquetIO.deleteRatio(spark, dir) == 0.0)
  }

  test("purgeWhere hides keys from every retained version; history reports the bindings") {
    val dir = freshTable("purge")
    ParquetIO.overwriteSwap(
      spark.range(100).toDF("k").withColumn("v", $"k" * 3), dir) // v2, v1 retained
    val n = ParquetIO.purgeWhere(spark, dir, $"k" % 10 === 0)
    assert(n == 20, s"10 keys x 2 versions expected, got $n")
    assert(keys(ParquetIO.readMoR(spark, dir)) == (0L until 100L).filter(_ % 10 != 0).toSet)
    assert(ParquetIO.readVersionMoR(spark, dir, 1L)
      .filter($"k" % 10 === 0).count() == 0, "time travel must not see purged keys")
    val hist = ParquetIO.history(spark, dir)
    assert(hist.map(_.version) == Seq(1L, 2L))
    assert(hist.forall(_.delete_vectors == 10L))
    assert(hist.filter(_.is_current).map(_.version) == Seq(2L))
    // purge + compact = prompt physical erasure of the current version
    ParquetIO.compact(spark, dir, targetBytes = 1L << 30)
    assert(ParquetIO.read(spark, dir).count() == 90)
  }

  test("history commit times are monotone; versionAsOf resolves the timestamp axis") {
    val dir = freshTable("asof")
    Thread.sleep(1100) // > any fs mtime granularity, so t1 < t2 strictly
    ParquetIO.overwriteSwap(
      spark.range(50).toDF("k").withColumn("v", $"k" * 3), dir) // v2
    val hist = ParquetIO.history(spark, dir)
    assert(hist.map(_.version) == Seq(1L, 2L))
    val Seq(t1, t2) = hist.map(_.commit_time_ms)
    assert(t1 <= t2, "commit times must be monotone with versions")
    assert(ParquetIO.versionAsOf(spark, dir, t1) == Some(1L))
    assert(ParquetIO.versionAsOf(spark, dir, t2 + 1000L) == Some(2L))
    assert(ParquetIO.versionAsOf(spark, dir, t1 - 1000L) == None,
      "before the first commit the table did not exist")
    // reading the resolved version is plain time travel
    assert(ParquetIO.readVersionMoR(spark, dir, 1L).count() == 100)
  }

  test("appendAsVersion rebases vectors under the linked names — deletes survive O(delta) append") {
    val dir = freshTable("append")
    ParquetIO.deleteWhere(spark, dir, $"k" % 4 === 1)
    ParquetIO.appendAsVersion(
      spark.range(100, 120).toDF("k").withColumn("v", $"k" * 2), dir)
    val expect = (0L until 100L).filter(_ % 4 != 1).toSet ++ (100L until 120L)
    assert(keys(ParquetIO.readMoR(spark, dir)) == expect,
      "carried-file vectors must keep applying after the hard-linked append")
    // and a second append keeps carrying them
    ParquetIO.appendAsVersion(
      spark.range(120, 125).toDF("k").withColumn("v", $"k" * 2), dir)
    assert(keys(ParquetIO.readMoR(spark, dir)) == expect ++ (120L until 125L))
  }
}
