import org.apache.spark.sql.SparkSession
object ProfQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    args.drop(1).foreach { n =>
      val q = graft.Registry.all.find(_.name == n).get
      (1 to 3).foreach { i =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        q.fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[prof] $n rep$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
