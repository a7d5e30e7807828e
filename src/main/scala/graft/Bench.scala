package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // median-of-N per query (n=1 made 1-3 s deltas unattributable noise)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-reader/shuffle paths once so the first
    // timed query isn't charged for session initialization
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try graft.Tables.load(spark, sfDir, "customer")
      .groupBy("c_mktsegment").count().count()
    catch { case _: Throwable => () }
    // optional regex filter for iterating on individual queries
    val selected = args.headOption
      .map(p => Registry.all.filter(_.name.matches(p)))
      .getOrElse(Registry.all)
    val results: Seq[(String, Seq[Double])] = selected.map { q =>
      val runs = (1 to reps).map { _ =>
        // Cache isolation: queries persist() intermediates they reference
        // more than once; without clearing, q19's cached signatures would
        // subsidize q40/q46 and repeated runs would accumulate entries —
        // per-query numbers become order-dependent and memory-coupled.
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // Force FULL materialization of every column with the noop sink:
        // a bare .count() lets Catalyst prune unreferenced projections, so
        // projection-heavy queries would be timed as scan+count only.
        try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      q.name -> runs
    }
    spark.catalog.clearCache()
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(median(v)) }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, v) =>
      s"\"" + k + "\":" + v.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(r => median(r._2)).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"runs":$runsJson,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
