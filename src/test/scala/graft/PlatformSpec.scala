package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the platform-surface operators (q195–q198). */
class PlatformSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q195: matches start with v, end with p, contain no e; flag agrees with extract") {
    import spark.implicits._
    val out = operators.Platform.q195EventPattern(spark, dir).persist()
    assert(out.count() > 0)
    val m = out.filter($"matched")
    assert(m.count() > 0, "no conversion session found at sf0.001")
    assert(m.filter(!($"match_str".startsWith("v") &&
      $"match_str".endsWith("p"))).count() == 0)
    assert(m.filter($"match_str".contains("e")).count() == 0,
      "an error event leaked into a match")
    assert(out.filter($"matched" =!= ($"match_str" =!= "")).count() == 0)
    // session universe identical to q14's
    assert(out.count() ==
      operators.Relational.q14Sessionize(spark, dir).count())
    out.unpersist(false)
  }

  test("q196: masking renders, row policy restricts to ASIA, admin stays clear") {
    import spark.implicits._
    val out = operators.Platform.q196MaskedView(spark, dir).persist()
    val analyst = out.filter($"role" === "analyst")
    assert(analyst.count() > 0)
    assert(analyst.filter(!$"c_name".endsWith("***")).count() == 0)
    assert(analyst.filter($"c_acctbal" % 100.0 =!= 0.0).count() == 0)
    // row policy: analyst keys are exactly the ASIA-region customers
    val asia = Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .join(Tables.load(spark, dir, "region"), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA").select($"c_custkey")
    assert(analyst.select($"c_custkey").exceptAll(asia).count() == 0)
    assert(asia.exceptAll(analyst.select($"c_custkey")).count() == 0)
    // admin view is the clear table
    assert(out.filter($"role" === "admin").count() ==
      Tables.load(spark, dir, "customer").count())
    out.unpersist(false)
  }

  test("q197: at least half the weight sits on each side of the weighted median") {
    import spark.implicits._
    val out = operators.Platform.q197WeightedMedian(spark, dir)
    val wts = Tables.load(spark, dir, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)).as("w"))
    val vals = Tables.load(spark, dir, "customer")
      .join(wts, $"c_custkey" === $"o_custkey")
      .select($"c_mktsegment", $"c_acctbal", $"w")
    val j = vals.join(out, Seq("c_mktsegment"))
    val below = j.filter($"c_acctbal" <= $"w_median")
      .groupBy($"c_mktsegment").agg(sum($"w").as("wle"), first($"total_w").as("tot"))
    assert(below.filter($"wle" * 2 < $"tot").count() == 0)
    val above = j.filter($"c_acctbal" >= $"w_median")
      .groupBy($"c_mktsegment").agg(sum($"w").as("wge"), first($"total_w").as("tot"))
    assert(above.filter($"wge" * 2 < $"tot").count() == 0)
  }

  test("q199: digit universe, non-negative chi terms, total consistency") {
    import spark.implicits._
    val out = operators.Platform.q199Benford(spark, dir).persist()
    assert(out.filter($"digit" < 1 || $"digit" > 9).count() == 0)
    assert(out.agg(sum($"n_obs")).collect()(0).getLong(0) ==
      Tables.load(spark, dir, "orders").count())
    assert(out.filter($"chi_contrib" < 0).count() == 0)
    val chi2 = out.select($"chi2").distinct().collect()
    assert(chi2.length == 1, "chi2 must be one global value")
    val summed = out.agg(sum($"chi_contrib")).collect()(0).getDouble(0)
    assert(math.abs(summed - chi2(0).getDouble(0)) < 1e-6)
    out.unpersist(false)
  }

  test("q200: the reflection identity reproduces the direct clamped recurrence") {
    import spark.implicits._
    val out = operators.Platform.q200ClampedBalance(spark, dir).persist()
    assert(out.filter($"bal" < 0).count() == 0, "balance went negative")
    // direct check: bal = max(prev_bal + delta, 0) row by row, in the
    // query's own (ts, event_id) order (event_id alone is not time order)
    val withTs = out.join(
      Tables.load(spark, dir, "events").select($"event_id", $"ts"), "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val bad = withTs
      .withColumn("prev", coalesce(lag($"bal", 1).over(w), lit(0L)))
      .filter($"bal" =!= greatest($"prev" + $"delta", lit(0L)))
    assert(bad.count() == 0, "reflection identity diverged from the recurrence")
    out.unpersist(false)
  }

  test("q198: true FK edges classify positive, the negative control stays negative") {
    import spark.implicits._
    val out = operators.Platform.q198FkInference(spark, dir).persist()
    assert(out.count() == 5)
    assert(out.filter($"child" === "orders.o_orderkey" && $"is_fk").count() == 0,
      "the non-key control classified as a foreign key")
    assert(out.filter($"child" =!= "orders.o_orderkey" && !$"is_fk").count() == 0,
      "a true foreign key failed to classify")
    assert(out.filter($"containment" < 0 || $"containment" > 1).count() == 0)
    out.unpersist(false)
  }
}
