package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located-join scale strategy (SURVEY.md §4): writing
  * both join sides bucketed by the join key lets the join run with ZERO
  * shuffle exchanges — the physical plan must show no Exchange above
  * either bucketed scan. This is the layout Pipeline would use for the
  * 100 TB fact tables.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("bucketed tables join without a shuffle exchange") {
    // explicit external-table paths: the (static) warehouse dir is unused
    val wh = Files.createTempDirectory("graft-bucket").toString
    val dir = "/root/testdata/sf0.001"
    Tables.load(spark, dir, "orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.load(spark, dir, "lineitem")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    // disable auto-broadcast so the join would otherwise shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // no shuffle below the join: the only exchange allowed is the
      // one for the final single-key aggregation
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not reshuffle its inputs:\n$plan")
      // and it still computes the right thing
      val expected = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderstatus").collect().toSeq ==
        expected.orderBy("o_orderstatus").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
