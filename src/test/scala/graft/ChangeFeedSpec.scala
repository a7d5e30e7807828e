package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangeFeed
import graft.pipeline.ParquetIO

/** The change data feed: row-level diff semantics over DataFrames and
  * over retained ParquetIO versions (time travel made consumable).
  */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def byType(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy($"_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("diff: every change type, unchanged keys silent, images carried intact") {
    val oldDf = Seq(
      (1L, "A", 10.0),  // unchanged
      (2L, "B", 20.0),  // value update
      (3L, "C", 30.0),  // segment update
      (4L, "D", 40.0)   // deleted in new
    ).toDF("k", "seg", "bal")
    val newDf = Seq(
      (1L, "A", 10.0),
      (2L, "B", 25.0),
      (3L, "X", 30.0),
      (5L, "E", 50.0)   // inserted
    ).toDF("k", "seg", "bal")
    val feed = ChangeFeed.diff(oldDf, newDf, Seq("k"))
    assert(feed.columns.toSeq == Seq("_change_type", "k", "seg", "bal"))
    assert(byType(feed) == Map(
      "insert" -> 1L, "delete" -> 1L,
      "update_preimage" -> 2L, "update_postimage" -> 2L))
    // unchanged key emits nothing
    assert(feed.filter($"k" === 1L).count() == 0)
    // the update pair carries pre AND post images of the changed row
    val k2 = feed.filter($"k" === 2L).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(k2 == Map("update_preimage" -> 20.0, "update_postimage" -> 25.0))
    // insert carries the post image, delete the pre image
    assert(feed.filter($"_change_type" === "insert").head().getDouble(3) == 50.0)
    assert(feed.filter($"_change_type" === "delete").head().getDouble(3) == 40.0)
  }

  test("diff: null-safe comparison — null->value and value->null are updates, null==null is unchanged") {
    val oldDf = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("k", "v")
    val newDf = Seq((1L, Some("y")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("k", "v")
    val feed = ChangeFeed.diff(oldDf, newDf, Seq("k"))
    assert(byType(feed) == Map("update_preimage" -> 2L, "update_postimage" -> 2L))
    assert(feed.filter($"k" === 3L).count() == 0, "null == null is not a change")
  }

  test("between: feed across two committed versions of a real ParquetIO table") {
    val dir = Files.createTempDirectory("graft-cdf").resolve("t").toString
    ParquetIO.overwriteSwap(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), dir)
    ParquetIO.overwriteSwap(Seq((1L, 1.5), (3L, 3.0)).toDF("k", "v"), dir)
    val feed = ChangeFeed.between(spark, dir, 1L, 2L, Seq("k"))
    assert(byType(feed) == Map(
      "insert" -> 1L, "delete" -> 1L,
      "update_preimage" -> 1L, "update_postimage" -> 1L))
    assert(feed.filter($"_change_type" === "insert").head().getLong(1) == 3L)
    assert(feed.filter($"_change_type" === "delete").head().getLong(1) == 2L)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("squash: composition law — squash(diff(a,b), diff(b,c)) == diff(a,c), roundtrips vanish") {
    val a = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0), (5L, 50.0))
      .toDF("k", "v")
    // b: 1 deleted, 2 updated, 6 inserted, 3 deleted (reinserted in c
    // identically), 4 deleted (reinserted in c changed)
    val b = Seq((2L, 21.0), (5L, 50.0), (6L, 60.0)).toDF("k", "v")
    // c: 2 updated again, 6 deleted again (net nothing), 3 back identical
    // (net nothing), 4 back changed (net update), 7 inserted
    val c = Seq((2L, 22.0), (3L, 30.0), (4L, 41.0), (5L, 50.0), (7L, 70.0))
      .toDF("k", "v")
    val keys = Seq("k")
    val squashed = ChangeFeed.squash(
      ChangeFeed.diff(a, b, keys), ChangeFeed.diff(b, c, keys), keys)
    val direct = ChangeFeed.diff(a, c, keys)
    assert(canon(squashed) == canon(direct),
      s"composition law broken:\n squashed=${canon(squashed)}\n direct=${canon(direct)}")
    // the interesting cases really occurred: 3 (identical roundtrip) and
    // 6 (insert-then-delete) are silent; 4 is a net update
    assert(squashed.filter($"k".isin(3L, 6L)).count() == 0)
    assert(byType(squashed.filter($"k" === 4L)) ==
      Map("update_preimage" -> 1L, "update_postimage" -> 1L))
  }

  test("applyFeed: consumer law — apply(a, diff(a,b)) == b, including through squash") {
    val a = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0), (5L, 50.0))
      .toDF("k", "v")
    val b = Seq((2L, 21.0), (5L, 50.0), (6L, 60.0)).toDF("k", "v")
    val c = Seq((2L, 22.0), (3L, 30.0), (4L, 41.0), (5L, 50.0), (7L, 70.0))
      .toDF("k", "v")
    val keys = Seq("k")
    assert(canon(ChangeFeed.applyFeed(a, ChangeFeed.diff(a, b, keys), keys)) == canon(b))
    val squashed = ChangeFeed.squash(
      ChangeFeed.diff(a, b, keys), ChangeFeed.diff(b, c, keys), keys)
    assert(canon(ChangeFeed.applyFeed(a, squashed, keys)) == canon(c),
      "applying the squashed chain must reconstruct the final state")
    // empty feed is the identity
    val empty = ChangeFeed.diff(a, a, keys)
    assert(canon(ChangeFeed.applyFeed(a, empty, keys)) == canon(a))
  }

  test("aggDelta + maintainAgg: maintenance equals recompute, emptied groups vanish") {
    val a = Seq((1L, "x", 10.0), (2L, "x", 20.0), (3L, "y", 30.0))
      .toDF("k", "g", "v")
    // group y empties (3 deleted); group z appears (4 inserted); x moves
    val b = Seq((1L, "x", 15.0), (2L, "x", 20.0), (4L, "z", 40.0))
      .toDF("k", "g", "v")
    import org.apache.spark.sql.types.DecimalType
    def aggOf(df: org.apache.spark.sql.DataFrame) = df.groupBy($"g").agg(
      count(lit(1)).as("n"), sum($"v".cast(DecimalType(18, 2))).as("t"))
    val maintained = ChangeFeed.maintainAgg(
      aggOf(a), ChangeFeed.aggDelta(ChangeFeed.diff(a, b, Seq("k")), Seq("g"), "v"),
      Seq("g"), "n", "t")
    assert(canon(maintained) == canon(aggOf(b)),
      "maintained aggregate diverged from direct recompute")
    assert(maintained.filter($"g" === "y").count() == 0, "emptied group must vanish")
  }

  test("align + between: evolved schema diffs with typed null preimages") {
    val dir = Files.createTempDirectory("graft-cdf-evo").resolve("t").toString
    ParquetIO.overwriteSwap(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), dir)
    ParquetIO.overwriteSwap(
      Seq((1L, 1.0, "x"), (2L, 2.5, "y")).toDF("k", "v", "tag"), dir)
    val feed = ChangeFeed.between(spark, dir, 1L, 2L, Seq("k"))
    assert(feed.columns.toSeq == Seq("_change_type", "k", "v", "tag"))
    // both keys update (tag null -> value); preimages carry null tag
    assert(byType(feed) == Map("update_preimage" -> 2L, "update_postimage" -> 2L))
    assert(feed.filter($"_change_type" === "update_preimage" && $"tag".isNotNull).count() == 0)
    assert(feed.filter($"_change_type" === "update_postimage" && $"tag".isNull).count() == 0)
  }

  test("readMerged: mixed-schema version from an evolved appendAsVersion") {
    val dir = Files.createTempDirectory("graft-merged").resolve("t").toString
    ParquetIO.overwriteSwap(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), dir)
    ParquetIO.appendAsVersion(Seq((3L, 3.0, "new")).toDF("k", "v", "tag"), dir)
    val merged = ParquetIO.readMerged(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("k", "tag", "v"))
    assert(merged.count() == 3)
    assert(merged.filter($"k" === 1L).head().getAs[String]("tag") == null)
    assert(merged.filter($"k" === 3L).head().getAs[String]("tag") == "new")
  }

  test("q174 carrier: all four change types present and keyed disjointly") {
    val feed = operators.ChangeFeed.q174ChangeFeed(spark, "/root/testdata/sf0.001")
    val m = byType(feed)
    assert(m.keySet == Set("insert", "delete", "update_preimage", "update_postimage"))
    assert(m("update_preimage") == m("update_postimage"))
    // the constructed states make the classes disjoint by construction:
    // inserts are %7=0 keys, deletes %5=0 keys, updates %3=0 keys
    val badIns = feed.filter($"_change_type" === "insert" && $"c_custkey" % 7 =!= 0).count()
    val badDel = feed.filter($"_change_type" === "delete" && $"c_custkey" % 5 =!= 0).count()
    val badUpd = feed.filter($"_change_type".startsWith("update") && $"c_custkey" % 3 =!= 0).count()
    assert(badIns == 0 && badDel == 0 && badUpd == 0)
  }
}
