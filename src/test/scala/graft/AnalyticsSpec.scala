package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-4 analytic operators (q87-q91) —
  * properties the oracle hash-compare cannot establish (both engines
  * could be wrong the same way).
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q87: offset-0 retention is exactly 1.0 and active never exceeds cohort") {
    val rows = operators.Analytics.q87CohortRetention(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (offset, size, active, ret) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(active <= size, s"active $active > cohort $size")
      if (offset == 0) assert(ret == 1.0,
        s"cohort ${r.getString(0)}: offset-0 retention $ret != 1.0")
    }
    // retention must not be vacuously 1.0 everywhere: some cohort loses users
    assert(rows.exists(r => r.getInt(1) > 0 && r.getDouble(4) < 1.0))
  }

  test("q88: worst-decile flag marks ~10% of docs, scores positive") {
    val rows = operators.TextAnalysis.q88BigramLm(spark, dir).collect()
    assert(rows.nonEmpty)
    val flagged = rows.count(_.getBoolean(3))
    val frac = flagged.toDouble / rows.length
    assert(frac > 0.05 && frac < 0.15, s"flagged fraction $frac")
    assert(rows.forall(_.getDouble(2) > 0.0))
    // flagged docs must be exactly the top-NLL tail
    val minFlagged = rows.filter(_.getBoolean(3)).map(_.getDouble(2)).min
    val maxClean = rows.filterNot(_.getBoolean(3)).map(_.getDouble(2)).max
    assert(minFlagged >= maxClean,
      s"flag is not a clean tail: minFlagged=$minFlagged maxClean=$maxClean")
  }

  test("q89: pageranks are positive, sorted, and mass-bounded") {
    val rows = operators.Analytics.q89PageRank(spark, dir).collect()
    assert(rows.length == 20)
    val prs = rows.map(_.getDouble(2))
    assert(prs.forall(_ > 0.0))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b }, "not sorted")
    assert(prs.sum < 1.0, "top-20 mass exceeds total rank mass")
  }

  test("q90: exactly 20 winners with ascending positive priorities") {
    val rows = operators.Analytics.q90WeightedSample(spark, dir).collect()
    assert(rows.length == 20)
    val pr = rows.map(_.getDouble(3))
    assert(pr.forall(_ > 0.0))
    assert(pr.zip(pr.tail).forall { case (a, b) => a <= b }, "not ascending")
  }

  test("q92: similarity orders the corruption classes typo > decorated > swap") {
    val rows = operators.Analytics.q92EditDistance(spark, dir).collect()
    assert(rows.length == 3)
    val sim = rows.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(sim("typo") > sim("decorated") && sim("decorated") > sim("word_swap"),
      s"edit distance fails to discriminate: $sim")
    val matchRate = rows.map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(matchRate("typo") > matchRate("word_swap"))
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("q93: spine is contiguous-hourly and gap flags agree with counts") {
    val rows = operators.Analytics.q93HourlyGapfill(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((r.getLong(1) == 0) == r.getBoolean(2), s"flag mismatch at $r")
    }
    // sf0.001 slice is sparse: both branches must be live
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)))
    // hourly spine has no holes: row count == hours between bounds + 1
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")
    val first = java.time.LocalDateTime.parse(rows.head.getString(0), fmt)
    val last = java.time.LocalDateTime.parse(rows.last.getString(0), fmt)
    val hours = java.time.Duration.between(first, last).toHours + 1
    assert(rows.length.toLong == hours,
      s"spine has holes: ${rows.length} rows vs $hours hours")
  }

  test("q94: merged aggregate state equals from-scratch recompute") {
    import spark.implicits._
    import graft.functions.Fns.exactSum2
    val merged = operators.Analytics.q94AggStateMerge(spark, dir)
    val direct = Tables.load(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        round(exactSum2($"o_totalprice"), 2).as("total"))
      .select($"o_custkey", $"n_orders", $"total",
        round($"total" / $"n_orders", 6).as("avg_order"))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty,
      "state merge diverges from recompute")
  }

  test("q95: sketch flags all true; trailing windows monotone at ramp-up") {
    val rows = operators.Sketches.q95RollingDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "a merged sketch strayed beyond 12%")
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("q96: rank statistics bounded and top spender leads each segment") {
    val rows = operators.Analytics.q96RankAnalytics(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pr, cume, q) = (r.getDouble(3), r.getDouble(4), r.getInt(5))
      assert(pr >= 0.0 && pr <= 1.0 && cume > 0.0 && cume <= 1.0)
      assert(q >= 1 && q <= 4)
    }
    val tops = rows.filter(_.getDouble(3) == 0.0)
    assert(tops.nonEmpty)
    tops.foreach(r => assert(r.getDouble(6) == 0.0,
      "segment top spender must have zero gap_to_prev"))
  }

  test("q97: diff classes match the deterministic mutation arithmetic") {
    import spark.implicits._
    val rows = operators.Analytics.q97TableDiff(spark, dir).collect()
    val byType = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val keys = Tables.load(spark, dir, "customer")
      .select($"c_custkey").collect().map(_.getLong(0))
    assert(byType.getOrElse("removed", 0) == keys.count(_ % 13 == 0))
    assert(byType.getOrElse("added", 0) == keys.count(_ % 11 == 0))
    assert(byType.getOrElse("changed", 0) ==
      keys.count(k => k % 7 == 0 && k % 13 != 0))
    rows.foreach { r =>
      r.getString(1) match {
        case "added"   => assert(r.isNullAt(2) && !r.isNullAt(3))
        case "removed" => assert(!r.isNullAt(2) && r.isNullAt(3))
        case "changed" => assert(math.abs(
          r.getDouble(3) - r.getDouble(2) - 100.0) < 1e-6)
      }
    }
  }

  test("q91: every vector assigned to a seed-derived cluster; Lloyd step helps") {
    import spark.implicits._
    val out = operators.Similarity.q91KmeansAssign(spark, dir)
    val n = Tables.load(spark, dir, "embeddings").count()
    val rows = out.collect()
    assert(rows.length == n, "every vector must be assigned exactly once")
    val clusters = rows.map(_.getLong(1)).toSet
    assert(clusters.subsetOf(Set(0L, 100L, 200L, 300L, 400L)))
    assert(clusters.size > 1, "degenerate single-cluster assignment")
    assert(rows.forall(_.getDouble(2) >= 0.0))
  }
}
