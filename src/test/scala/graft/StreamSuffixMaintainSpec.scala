package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SuffixIndex
import graft.streaming.StreamingOps

/** q327's staged world lives in TWO independently lifecycled roots: the
  * corpus + `_complete` marker under tmpdir/graft-suffix-stream, and the
  * maintained suffix index under the artifact root (SPARK_GRAFT_INDEX_DIR,
  * documented rm-rf-safe). Round 14 regression: a `_complete` marker whose
  * index half is gone (index root wiped, crash before ensure() committed,
  * or a different index root than the staging run) must RE-EXERCISE the
  * loop — the original code crashed reading `_last_arm`, and a bare
  * ensure() would have taken the rebuild arm and broken the 'merge' pin.
  */
class StreamSuffixMaintainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rmTree(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally st.close()
    }

  test("torn stage (marker without index) re-exercises the loop; arm stays merge") {
    val dir = "/root/testdata/sf0.001"
    val r1 = StreamingOps.q327StreamSuffixMaintain(spark, dir)
      .collect().map(_.toString).sorted
    assert(r1.nonEmpty)
    // locate the staged corpus this run used and wipe ONLY its index half
    val streamRoot = java.nio.file.Paths
      .get(sys.props("java.io.tmpdir"), "graft-suffix-stream")
    val stages = {
      val st = Files.list(streamRoot)
      try {
        val it = st.iterator()
        var acc = List.empty[Path]
        while (it.hasNext) acc = it.next() :: acc
        acc
      } finally st.close()
    }
    val torn = stages.filter { stage =>
      val staged = stage.resolve("corpus")
      val idx = SuffixIndex.indexPathFor(staged.toString)
      if (Files.exists(stage.resolve("_complete")) && Files.exists(idx)) {
        rmTree(idx); true
      } else false
    }
    assert(torn.nonEmpty, "expected a completed stage with a live index")
    spark.catalog.clearCache()
    val r2 = StreamingOps.q327StreamSuffixMaintain(spark, dir)
      .collect().map(_.toString).sorted
    assert(r2.sameElements(r1)) // incl. arm == 'merge' on every row
  }
}
