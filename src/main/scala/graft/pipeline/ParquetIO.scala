package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic parquet table IO shared by the batch orchestrator and the
  * streaming upsert sink: write to a tmp sibling (which also materializes
  * any self-referencing read), then swap directories — re-runs are
  * idempotent like MERGE (SURVEY.md §2.1 S6/S7).
  *
  * Crash safety: the reference gets transactional MERGE from its
  * warehouse; a vanilla-Spark directory swap has a destructive window
  * (delete target .. atomic move). A `.swap-pending` marker file
  * brackets that window — written only after the tmp table is COMPLETE
  * (its _SUCCESS exists), removed after the move — so a killed run is
  * DETECTABLE, and [[recover]] can roll the swap forward (tmp was the
  * committed content) or discard the garbage tmp, instead of a reader
  * silently finding a half-written or missing table. Single-writer by
  * design; multi-writer atomicity needs a transactional table format,
  * which the offline jar set can't ship.
  */
object ParquetIO {

  def exists(dir: String): Boolean =
    Files.exists(Paths.get(dir, "_SUCCESS"))

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  private def marker(dir: String): Path = Paths.get(dir + ".swap-pending")

  /** Heal a swap interrupted by a crash. Marker present means the writer
    * died inside the destructive window: if the target is gone and the
    * tmp table is complete, the swap is rolled FORWARD (tmp holds the
    * fully-written new table); otherwise the target is still intact and
    * the tmp is discarded. Idempotent; no-op without a marker.
    */
  def recover(dir: String): Unit = {
    val m = marker(dir)
    if (Files.exists(m)) {
      val target = Paths.get(dir)
      val tmp = Paths.get(dir + ".tmp")
      if (!Files.exists(target) && Files.exists(tmp.resolve("_SUCCESS")))
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      else
        deleteRecursive(tmp)
      Files.delete(m)
    }
  }

  def overwriteSwap(df: DataFrame, dir: String): Unit = {
    recover(dir)
    val target = Paths.get(dir)
    val tmp = Paths.get(dir + ".tmp")
    deleteRecursive(tmp)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    Files.writeString(marker(dir), "swap-pending") // tmp is complete from here
    deleteRecursive(target)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    Files.delete(marker(dir))
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
