package graft

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** File-level contract of the [[operators.SuffixIndex]] merge arm
  * (round 13): a full build over a base corpus followed by an APPEND of
  * new document part files must leave the `ranks` table EQUAL to a
  * from-scratch rebuild over the union — via the MERGE arm (window
  * prefix-sums + collision-only comparison, `_last_arm` breadcrumb),
  * never a re-run of the doubling — including when the delta duplicates
  * base text verbatim (deep window collisions all the way to identical
  * suffixes, where only the (doc_id, pos) tie-break decides).
  */
class SuffixIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def landDelta(df: org.apache.spark.sql.DataFrame, dir: Path): Unit = {
    val scratch = Files.createTempDirectory("suffix-delta")
    df.write.mode("overwrite").parquet(scratch.toString)
    val target = dir.resolve("documents.parquet")
    val st = Files.list(scratch)
    try st.iterator().asScala.toSeq
      .filter { p =>
        val n = p.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".")
      }
      .foreach(p => Files.move(p, target.resolve(s"delta-${p.getFileName}"),
        StandardCopyOption.ATOMIC_MOVE))
    finally st.close()
  }

  private def corpusDir(df: org.apache.spark.sql.DataFrame): Path = {
    val dir = Files.createTempDirectory("suffix-corpus")
    df.write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    dir
  }

  private def rankTriples(dir: String): Set[(Long, Long, Long)] = {
    import spark.implicits._
    operators.SuffixIndex.ranks(spark, dir)
      .selectExpr("CAST(rank AS LONG)", "CAST(doc_id AS LONG)", "CAST(pos AS LONG)")
      .as[(Long, Long, Long)].collect().toSet
  }

  private def lastArm(dir: String): String =
    Files.readString(
      operators.SuffixIndex.indexPathFor(dir).resolve("_last_arm")).trim

  test("append of new document files ≡ full rebuild of the permutation, via the merge arm") {
    import spark.implicits._
    // pool = doc_id % 10 == 0; long shared regions force deep window
    // collisions, distinct tails force post-collision resolution, and
    // doc 60 duplicates doc 10's text VERBATIM so identical suffixes
    // exercise the (doc_id, pos) tie-break; non-pool docs must be
    // ignored by both arms
    val shared = ("the quick brown fox jumps over the lazy dog " * 3).trim
    val base = Seq(
      (10L, s"$shared alpha ending one"),
      (20L, s"$shared beta ending two"),
      (30L, "completely different text with no overlap at all"),
      (7L, "not in the pool"),
      (40L, "zebra yak xylophone walrus vulture")).toDF("doc_id", "text")
    val delta = Seq(
      (50L, s"$shared gamma ending three"),
      (60L, s"$shared alpha ending one"),
      (13L, "also not in the pool")).toDF("doc_id", "text")

    val grownDir = corpusDir(base)
    operators.SuffixIndex.ensure(spark, grownDir.toString)
    assert(lastArm(grownDir.toString) == "rebuild")
    val baseRanks = rankTriples(grownDir.toString)

    landDelta(delta, grownDir)
    val grownRanks = rankTriples(grownDir.toString)
    assert(lastArm(grownDir.toString) == "merge",
      "append of new part files must take the merge arm")

    val fullRanks = rankTriples(corpusDir(base.unionByName(delta)).toString)
    assert(grownRanks == fullRanks,
      s"merge != rebuild: missing=${(fullRanks -- grownRanks).take(5)} " +
        s"extra=${(grownRanks -- fullRanks).take(5)}")
    assert(grownRanks.size > baseRanks.size)
    // dense permutation 1..N
    val n = grownRanks.size.toLong
    assert(grownRanks.map(_._1) == (1L to n).toSet,
      "merged ranks must be a dense 1..N permutation")

    // fresh fingerprint fast-path: no new build
    operators.SuffixIndex.ensure(spark, grownDir.toString)
    assert(lastArm(grownDir.toString) == "merge")
  }

  test("a delta with no pool documents applies without touching the ranks") {
    import spark.implicits._
    val base = Seq((10L, "some pool document text here"),
      (3L, "non pool")).toDF("doc_id", "text")
    val grownDir = corpusDir(base)
    operators.SuffixIndex.ensure(spark, grownDir.toString)
    val before = rankTriples(grownDir.toString)
    val rT = operators.SuffixIndex.tableDir(grownDir.toString, "ranks")
    val vBefore = pipeline.ParquetIO.currentVersion(rT).get

    landDelta(Seq((21L, "still not pool"), (33L, "me neither"))
      .toDF("doc_id", "text"), grownDir)
    assert(rankTriples(grownDir.toString) == before)
    assert(pipeline.ParquetIO.currentVersion(rT).get == vBefore,
      "an empty pool delta must not rewrite the ranks table")
  }
}
