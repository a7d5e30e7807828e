package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Date-partitioned layout + partition pruning (SURVEY.md §4: "partition
  * RAW/staging by ingest date" for the 100 TB posture): writing
  * partitionBy(event_date) and filtering on the partition column must
  * prune at planning time — the scan's partition count drops and the
  * plan shows the partition filter, without reading file contents.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("date-partitioned write is pruned by partition filters") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-part").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("event_date", to_date($"ts"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)

    val nDates = spark.read.parquet(out)
      .select($"event_date").distinct().count()
    assert(nDates > 3)

    val pruned = spark.read.parquet(out)
      .filter($"event_date" === lit("2024-01-02").cast("date"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    // planning-time file listing only touches the one partition
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanned.contains("event_date"), s"expected partition filter in scan:\n$plan")
    // and the data is right: exactly the rows of that date
    val expected = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter(to_date($"ts") === lit("2024-01-02").cast("date")).count()
    assert(pruned.count() == expected && expected > 0)
  }
}
