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

  test("withGlobalPrefixSums matches the single-partition window bit for bit") {
    import spark.implicits._
    val o = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", lit(1L).as("one"),
        ($"o_custkey" % 7).as("sev"))
    val dev = operators.GlobalRank
      .withGlobalPrefixSums(o, Seq("one" -> "c1", "sev" -> "c7"),
        $"o_orderkey".asc)
      .select($"o_orderkey", $"c1", $"c7")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"o_orderkey")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val naive = o.coalesce(1)
      .select($"o_orderkey", sum($"one").over(w).as("c1"),
        sum($"sev").over(w).as("c7"))
    assert(dev.exceptAll(naive).count() == 0 &&
      naive.exceptAll(dev).count() == 0,
      "prefix-sum device diverged from the single-partition window")
  }

  test("q212: D in [0,1], attained at an observed price, totals partition orders") {
    import spark.implicits._
    val r = operators.Platform.q212KsTest(spark, dir).collect()
    assert(r.length == 1)
    val (d, at) = (r(0).getDouble(0), r(0).getDouble(1))
    assert(d >= 0.0 && d <= 1.0, s"KS statistic out of range: $d")
    val o = Tables.load(spark, dir, "orders")
    assert(o.filter($"o_totalprice" === at).count() > 0,
      "argmax location is not an observed value")
    assert(r(0).getLong(2) + r(0).getLong(3) == o.count(),
      "era counts don't partition orders")
  }

  test("q213: constant candidate degenerates exactly; entropies consistent") {
    val rows = operators.Platform.q213InfoGain(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("constant", "cust_mod16", "priority", "year"))
    val byCand = rows.map(r => r.getString(0) -> r).toMap
    val const = byCand("constant")
    assert(const.getLong(1) == 1 && const.getDouble(4) == 0.0,
      "constant column must have one value and zero gain")
    assert(const.isNullAt(5), "gain ratio over H(X)=0 must be NULL")
    // H(Y) is a property of Y alone: identical across candidates
    assert(rows.map(_.getDouble(2)).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getDouble(4) >= -1e-6, s"negative info gain: $r")
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-6,
        "conditioning increased entropy")
    }
  }

  test("q214: centered cumsum closes at zero, exactly one change point") {
    import spark.implicits._
    val out = operators.Platform.q214CusumChangepoint(spark, dir).persist()
    val rows = out.orderBy($"m").collect()
    assert(rows.length > 12, "monthly series too short")
    assert(rows.last.getDouble(2) == 0.0,
      s"S_M must be exactly 0, got ${rows.last.getDouble(2)}")
    assert(rows.count(_.getBoolean(3)) == 1, "change point flag not unique")
    val peak = rows.filter(_.getBoolean(3)).head
    assert(rows.forall(r => math.abs(r.getDouble(2)) <=
      math.abs(peak.getDouble(2))), "flagged month is not the |S| peak")
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

  test("q264: bootstrap CI brackets the point estimate and SE is sane") {
    val r = operators.Platform.q264PoissonBootstrap(spark, dir)
      .collect().head
    val (n, mean, lo, hi, se) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n > 0 && lo <= hi)
    assert(se > 0, "bootstrap SE must be positive")
    // Poisson-bootstrap replicate means concentrate ~ SE-tight around
    // the truth; the 90% CI missing the point estimate at this width
    // would mean the hash coin is biased
    assert(r.getBoolean(5), s"CI [$lo,$hi] does not cover point $mean")
    assert(hi - lo < mean, "CI wider than the mean itself — degenerate")
  }

  test("q265: gini and hhi are in-range and consistent with concentration") {
    import spark.implicits._
    val rows = operators.Platform.q265GiniConcentration(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, g, h) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(g >= 0.0 && g < 1.0, s"gini $g out of range")
      assert(h >= 1.0 / n - 1e-9 && h <= 1.0, s"hhi $h out of [1/n, 1]")
    }
  }

  test("q268: CUPED preserves the grand mean and never inflates variance") {
    import spark.implicits._
    val rows = operators.Platform.q268Cuped(spark, dir).collect()
    assert(rows.nonEmpty)
    val vr = rows.head.getDouble(5)
    assert(vr > 0.0 && vr <= 1.0, s"variance ratio $vr out of (0,1]")
    // theta identical on every row (it is the global adjustment)
    assert(rows.map(_.getDouble(4)).distinct.length == 1)
    // CUPED is mean-preserving over ALL units: sum_s n_s*(adj - raw)
    // = -theta * sum_s n_s*(xbar_s - xbar) = 0
    val shift = rows.map(r => r.getLong(1) * (r.getDouble(3) - r.getDouble(2))).sum
    val total = rows.map(r => r.getLong(1) * math.abs(r.getDouble(2))).sum
    assert(math.abs(shift) < 1e-6 * math.max(total, 1.0),
      s"adjustment not mean-preserving: $shift")
  }

  test("q269: DiD equals the hand-computed cell contrast") {
    val r = operators.Platform.q269DiffInDiff(spark, dir).collect().head
    val did = (r.getDouble(1) - r.getDouble(0)) -
      (r.getDouble(3) - r.getDouble(2))
    assert(math.abs(r.getDouble(4) - did) < 1e-6)
    assert(r.getDouble(5) > 0, "SE must be positive")
    assert(math.abs(r.getDouble(6) - r.getDouble(4) / r.getDouble(5)) < 1e-4)
  }

  test("q272: conformal coverage meets the 0.9 target on every segment") {
    val rows = operators.Platform.q272ConformalInterval(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(3) > 0,
        s"${r.getString(0)}: empty split")
      // n_cal < 9 makes ceil(0.9*(n+1)) > n: q-hat is NULL (unbounded
      // interval, coverage 1.0 by convention) — the sf0.001 segments
      // are small enough to exercise both arms
      if (r.isNullAt(5)) assert(r.getDouble(6) == 1.0,
        "unbounded interval must cover everything")
      else assert(r.getDouble(5) > 0, "qhat must be positive")
      // the conformal theorem guarantees >= 0.9 in expectation; the
      // bin rounding only widens, so demanding >= 0.8 per segment at
      // this sample size is safe and still catches a broken quantile
      assert(r.getDouble(6) >= 0.8,
        s"${r.getString(0)}: coverage ${r.getDouble(6)} too low")
    }
  }

  test("q273: U statistic is consistent with its own z and effect size") {
    val r = operators.Platform.q273MannWhitney(spark, dir).collect().head
    val (n1, n2, u1) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(n1 > 0 && n2 > 0)
    assert(u1 >= 0 && u1 <= n1.toDouble * n2, "U out of [0, n1*n2]")
    val rb = 1.0 - 2.0 * u1 / (n1.toDouble * n2)
    assert(math.abs(r.getDouble(4) - rb) < 1e-4)
    assert(math.abs(r.getDouble(4)) <= 1.0)
  }

  test("q274: XmR limits bracket the center and flags agree with limits") {
    val rows = operators.Platform.q274XmrControlChart(spark, dir).collect()
    assert(rows.length >= 3)
    // first month has no moving range
    assert(rows.head.isNullAt(2))
    rows.foreach { r =>
      val (rev, c, u, l) = (r.getDouble(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      assert(l < c && c < u, "limits must bracket the center")
      assert(r.getBoolean(6) == (rev > u || rev < l),
        s"${r.getString(0)}: flag disagrees with limits")
    }
  }

  test("q280: Theil contributions decompose additively and are nonnegative in total") {
    val rows = operators.Platform.q280TheilDecomposition(spark, dir).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < 1e-4, "shares must sum to 1")
    // T = sum(share*within) + sum(between) = sum(total_contrib)
    val t1 = rows.map(r => r.getDouble(2) * r.getDouble(3)).sum +
      rows.map(_.getDouble(4)).sum
    val t2 = rows.map(_.getDouble(5)).sum
    assert(math.abs(t1 - t2) < 1e-4, s"decomposition broken: $t1 vs $t2")
    assert(t2 > 0, "revenue inequality must be positive")
    rows.foreach(r => assert(r.getDouble(3) >= -1e-9,
      s"${r.getString(0)}: within-Theil negative"))
  }

  test("q281: Spearman rho is in range and strongly positive for freq vs spend") {
    val r = operators.Platform.q281SpearmanRho(spark, dir).collect().head
    val rho = r.getDouble(1)
    assert(rho >= -1.0 && rho <= 1.0)
    assert(rho > 0.5, s"order frequency and spend must co-rank, got $rho")
    assert(r.getDouble(2) > 0, "t-stat sign must match rho")
  }

  test("q282: gains are monotone to 1.0 and lift decays toward 1") {
    val rows = operators.Platform.q282CumulativeGains(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(rows.length == 10)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(3) <= b.getDouble(3) + 1e-12, "gains not monotone")
        assert(a.getDouble(4) >= b.getDouble(4) - 1e-9,
          "cumulative lift must not increase")
      case _ =>
    }
    assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-9,
      "decile 10 must capture everyone")
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-9,
      "full-population lift is 1 by definition")
  }

  test("q285: the shipped expectation suite passes on the generated data") {
    val rows = operators.Platform.q285ExpectationSuite(spark, dir).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) == 0L),
        s"rule ${r.getInt(0)}: passed flag disagrees with count")
      assert(r.getBoolean(3), s"rule '${r.getString(1)}' failed with " +
        s"${r.getLong(2)} violations — generator contract changed")
    }
  }

  test("q286: Wilson intervals contain the rate and tighten with n") {
    val rows = operators.Platform.q286WilsonInterval(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rate, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= rate && rate <= hi,
        s"${r.getString(0)}: Wilson CI [$lo,$hi] must contain $rate")
      assert(lo >= 0.0 && hi <= 1.0, "CI must stay in [0,1]")
    }
    // flag consistency against the recomputed global rate
    val grate = rows.map(_.getLong(2)).sum.toDouble /
      rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val excl = r.getDouble(5) < grate || r.getDouble(4) > grate
      assert(r.getBoolean(6) == excl,
        s"${r.getString(0)}: differs_from_global flag inconsistent")
    }
  }

  test("q266: isotonic fit is monotone and preserves weighted mass") {
    val rows = operators.Platform.q266IsotonicCalibration(spark, dir)
      .collect().sortBy(_.getLong(0))
    assert(rows.length >= 3)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(4) <= b.getDouble(4) + 1e-12,
          s"iso not monotone at bins ${a.getLong(0)}->${b.getLong(0)}")
      case _ =>
    }
    // PAVA preserves the weighted mean: sum n_i * iso_i == sum bad_i
    val fitted = rows.map(r => r.getLong(1) * r.getDouble(4)).sum
    val bad = rows.map(_.getLong(2)).sum.toDouble
    assert(math.abs(fitted - bad) < 1e-4 * rows.map(_.getLong(1)).sum,
      s"mass not preserved: fitted $fitted vs bad $bad")
  }
}
