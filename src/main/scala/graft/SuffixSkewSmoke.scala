package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the [[operators.SuffixIndex]] merge arm's collision
  * BOUNDING on the adversarial corpus class the r13 verdict named: one
  * boilerplate string repeated k times across pool and delta (license
  * headers, templated docs — exactly what a dedup pipeline ingests).
  * The r13 all-pairs kernel paired every delta suffix against every
  * same-window suffix — k_delta × k_total rows per window group, k² on
  * this corpus. The bounded arm re-windows groups past
  * [[operators.SuffixIndex.MergeCollisionCap]] by doubling chunks and
  * counts cross-chunk order with per-group DISTINCT-chunk windows, so
  * comparison rows are capped at cap·|delta| by construction. This
  * smoke runs the append at growing k and prints, per level, the
  * measured kernel rows next to the naive Σ ndel·(nt−1) the unbounded
  * kernel would have materialized — the k·cap vs k² record the r14
  * done-criterion asks for.
  *
  * Usage: runMain graft.SuffixSkewSmoke [workDir]
  */
object SuffixSkewSmoke {

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft-suffix-skew-smoke")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val boiler =
      ("all rights reserved redistribution and use in source and binary forms " +
        "with or without modification are permitted provided that " * 2).trim
    val levels = Seq(250, 500, 1000)
    val recs = levels.map { k =>
      val dir = s"$work/k$k"
      deleteRecursively(Paths.get(dir))
      val base = spark.range(1, k + 1)
        .select(($"id" * 10).as("doc_id"),
          concat(lit(s"$boiler tail "), $"id".cast("string")).as("text"))
      base.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      deleteRecursively(operators.SuffixIndex.indexPathFor(dir))
      operators.SuffixIndex.ensure(spark, dir)

      val delta = spark.range(1, k / 10 + 1)
        .select((lit(1000000L) + $"id" * 10).as("doc_id"),
          concat(lit(s"$boiler delta "), $"id".cast("string")).as("text"))
      // what the r13 all-pairs kernel would have materialized: per
      // equal-window group, every delta suffix × every other member
      val w = (df: DataFrame) => df
        .select($"doc_id", explode(sequence(lit(1), length($"text"))).as("pos"),
          $"text")
        .select(expr(s"substring(text, pos, ${operators.Dedup.SufBase})").as("g"))
      val naive = w(base).groupBy($"g").agg(count(lit(1)).as("cb"))
        .join(w(delta).groupBy($"g").agg(count(lit(1)).as("cd")), Seq("g"))
        .select(sum($"cd" * ($"cb" + $"cd" - 1))).head().getLong(0)

      landDelta(delta, s"$dir/documents.parquet", s"$work/scratch")
      val t0 = System.nanoTime()
      operators.SuffixIndex.ensure(spark, dir)
      val sec = (System.nanoTime() - t0) / 1e9
      val arm = Files.readString(
        operators.SuffixIndex.indexPathFor(dir).resolve("_last_arm")).trim
      val kern = operators.SuffixIndex.lastMergeKernelRows
      val rounds = operators.SuffixIndex.lastMergeRounds
      System.err.println(
        f"[suffix-skew-smoke] k=$k%d append=$sec%.2f s arm=$arm " +
          s"kernelRows=$kern naiveRows=$naive rounds=$rounds")
      s"""{"k":$k,"append_sec":${f"$sec%.2f"},"kernel_rows":$kern,""" +
        s""""naive_rows":$naive,"rounds":$rounds,"arm":"$arm"}"""
    }
    println(s"""{"levels":[${recs.mkString(",")}]}""")
    spark.stop()
  }

  private def landDelta(df: DataFrame, target: String, scratch: String): Unit = {
    df.write.mode("overwrite").parquet(scratch)
    val tp = Paths.get(target)
    val st = Files.list(Paths.get(scratch))
    try st.iterator().asScala.toSeq
      .filter { p =>
        val n = p.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".")
      }
      .foreach(p => Files.move(p, tp.resolve(s"delta-${p.getFileName}"),
        StandardCopyOption.ATOMIC_MOVE))
    finally st.close()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
      finally st.close()
    }
}
