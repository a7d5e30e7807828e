package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the incremental arm of the materialized graph index
  * ([[operators.GraphIndex]]) against the full build it replaces — the
  * [[AppendSmoke]] discipline applied to edges:
  *
  *  1. assemble a K-replica orders+lineitem corpus (key-offset replicas,
  *     the [[ScaleSmoke]] recipe) and time `GraphIndex.ensure` — the
  *     full orders ⋈ lineitem derivation;
  *  2. land ONE more replica's part files in the same source dirs (the
  *     append-only growth `incrementalDelta` detects) and time `ensure`
  *     again — the delta-only derivation + anti-join + degree merge;
  *  3. report wall seconds AND task-level bytesRead for both phases:
  *     the append derives edges from 1/K of the raw bytes plus one scan
  *     of the compact edge artifact, never a raw rebuild.
  *
  * Also checks the append arm actually ran (edges version moved by one
  * AND carries hard-linked `prev*` files) — a silent fall-through to
  * the rebuild would make the timing comparison vacuous.
  *
  * Usage: runMain graft.GraphAppendSmoke [srcSfDir] [K] [workDir]
  */
object GraphAppendSmoke {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 4
    val work = if (args.length > 2) args(2) else "/tmp/graft-graph-append-smoke"
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

    val bytesRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    def measured[A](f: => A): (A, Double, Long) = {
      Thread.sleep(2000)
      val b0 = bytesRead.get(); val t0 = System.nanoTime()
      val a = f
      Thread.sleep(2000)
      (a, (System.nanoTime() - t0) / 1e9 - 2.0, bytesRead.get() - b0)
    }

    // key-offset replica i of the two graph sources (the ScaleSmoke
    // formulas, restricted to the columns the index reads)
    val ob = Tables.load(spark, src, "orders").select($"o_orderkey", $"o_custkey")
    val lb = Tables.load(spark, src, "lineitem").select($"l_orderkey", $"l_suppkey")
    val mo = ob.agg(max($"o_orderkey")).first().getLong(0) + 1L
    val mc = ob.agg(max($"o_custkey")).first().getLong(0) + 1L
    val ms = lb.agg(max($"l_suppkey")).first().getLong(0) + 1L
    def ordersRep(i: Int): DataFrame = ob.select(
      ($"o_orderkey" + i * mo).as("o_orderkey"), ($"o_custkey" + i * mc).as("o_custkey"))
    def lineitemRep(i: Int): DataFrame = lb.select(
      ($"l_orderkey" + i * mo).as("l_orderkey"), ($"l_suppkey" + i * ms).as("l_suppkey"))

    val dir = s"$work/k$k"
    (0 until k).map(ordersRep).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (0 until k).map(lineitemRep).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    deleteRecursively(operators.GraphIndex.indexPathFor(dir))

    val (_, buildSec, buildBytes) = measured(operators.GraphIndex.ensure(spark, dir))
    val edgesT = operators.GraphIndex.tableDir(dir, "edges")
    val vBefore = pipeline.ParquetIO.currentVersion(edgesT).get
    val edgesBefore = pipeline.ParquetIO.read(spark, edgesT).count()

    // land replica K as new part files in the SAME source dirs
    landDelta(spark, ordersRep(k), s"$dir/orders.parquet", s"$work/scratch-o")
    landDelta(spark, lineitemRep(k), s"$dir/lineitem.parquet", s"$work/scratch-l")

    val (_, appendSec, appendBytes) = measured(operators.GraphIndex.ensure(spark, dir))

    val vAfter = pipeline.ParquetIO.currentVersion(edgesT).get
    val edgesAfter = pipeline.ParquetIO.read(spark, edgesT).count()
    val vp = Paths.get(pipeline.ParquetIO.versionPath(edgesT, vAfter))
    val st = Files.list(vp)
    val hasPrev = try st.iterator().asScala.exists(_.getFileName.toString.startsWith(s"prev${vBefore}_"))
      finally st.close()
    // replica K's edge set is key-disjoint from the base, so it must add
    // exactly edgesBefore / k rows
    val tookAppendArm = vAfter == vBefore + 1 && hasPrev &&
      edgesAfter - edgesBefore == edgesBefore / k
    System.err.println(
      f"[graph-append-smoke] build: $buildSec%.2f s / ${buildBytes / 1e6}%.1f MB read; " +
        f"append: $appendSec%.2f s / ${appendBytes / 1e6}%.1f MB read; " +
        s"appendArm=$tookAppendArm (edges $edgesBefore -> $edgesAfter, " +
        s"version $vBefore -> $vAfter)")
    println(s"""{"k":$k,"src":"$src","build_sec":${f"$buildSec%.2f"},""" +
      s""""append_sec":${f"$appendSec%.2f"},"build_bytes":$buildBytes,""" +
      s""""append_bytes":$appendBytes,"append_arm":$tookAppendArm}""")
    spark.stop()
  }

  private def landDelta(spark: SparkSession, df: DataFrame, target: String, scratch: String): Unit = {
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
