package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-reader/shuffle paths once so the first
    // timed query isn't charged for session initialization (deliberately
    // NOT a registry query: their persisted caches would rig their own
    // timings)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try graft.Tables.load(spark, sfDir, "customer")
      .groupBy("c_mktsegment").count().count()
    catch { case _: Throwable => () }
    // optional regex filter for iterating on individual queries
    val selected = args.headOption
      .map(p => SparkEntry.queries.filter { case (n, _) => n.matches(p) })
      .getOrElse(SparkEntry.queries)
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // Force FULL materialization of every column with the noop sink:
      // a bare .count() lets Catalyst prune unreferenced projections, so
      // projection-heavy queries would be timed as scan+count only.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
