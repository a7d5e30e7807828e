package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic parquet table IO shared by the batch orchestrator and the
  * streaming upsert sink: write to a tmp sibling (which also materializes
  * any self-referencing read), then swap directories — re-runs are
  * idempotent like MERGE (SURVEY.md §2.1 S6/S7).
  */
object ParquetIO {

  def exists(dir: String): Boolean =
    Files.exists(Paths.get(dir, "_SUCCESS"))

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  def overwriteSwap(df: DataFrame, dir: String): Unit = {
    val target = Paths.get(dir)
    val tmp = Paths.get(dir + ".tmp")
    deleteRecursive(tmp)
    df.write.mode("overwrite").parquet(tmp.toString)
    deleteRecursive(target)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
