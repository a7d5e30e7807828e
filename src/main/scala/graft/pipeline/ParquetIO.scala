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
    * died inside the destructive window — which includes the NON-atomic
    * delete of the target, so the target may exist as a PARTIAL remnant
    * (a crash mid-delete). Keying the decision on target existence would
    * treat that remnant as intact and discard the complete tmp (the only
    * good copy of the new table). Since the marker is written only after
    * tmp/_SUCCESS exists, a complete tmp always wins: roll FORWARD —
    * clear any target remnant, move tmp into place. Only a tmp without
    * _SUCCESS is garbage, and then the marker's write-after-complete
    * invariant means the delete never started and the target is intact.
    * Idempotent; no-op without a marker.
    */
  def recover(dir: String): Unit = {
    val m = marker(dir)
    if (Files.exists(m)) {
      val target = Paths.get(dir)
      val tmp = Paths.get(dir + ".tmp")
      if (Files.exists(tmp.resolve("_SUCCESS"))) {
        deleteRecursive(target)
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      } else
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
