package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-4 warehouse/curation operators
  * (q98-q108) — properties the oracle hash-compare cannot establish
  * (both engines could be wrong the same way).
  */
class WarehouseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q98: fused ranking is contiguous per query and respects rank-1 agreement") {
    val rows = operators.Retrieval.q98RrfHybrid(spark, dir).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getString(0))
    byQ.foreach { case (qid, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.sameElements(1 to rs.length), s"$qid ranks not contiguous")
      // rrf non-increasing with rank
      val inOrder = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(inOrder.zip(inOrder.tail).forall { case (a, b) => a >= b })
      // the PRF seed doc (bm25 rank 1) scores in both systems, so it
      // must carry the maximal possible rrf and fuse at rank 1
      val top = rs.minBy(_.getInt(1))
      assert(!top.isNullAt(4) && top.getInt(4) == 1, s"$qid top not bm25-1")
      assert(!top.isNullAt(5) && top.getInt(5) == 1, s"$qid top not dense-1")
    }
  }

  test("q99: removal only ever points backward and totals are consistent") {
    val rows = operators.Dedup.q99BlockDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, nr) = (r.getLong(1), r.getLong(2))
      assert(nr <= nb, s"doc ${r.getLong(0)}: removed $nr > blocks $nb")
    }
    // doc 0's blocks are globally first-seen for its own content: its
    // removed count can only come from earlier blocks of doc 0 itself,
    // and block 0 of doc 0 is the corpus-wide first block ever seen.
    val d0 = rows.find(_.getLong(0) == 0L).get
    assert(d0.getLong(2) < d0.getLong(1), "doc 0 lost every block")
    // the corpus must contain SOME duplication or the pass is vacuous
    assert(rows.map(_.getLong(2)).sum > 0, "no block ever removed (vacuous)")
  }

  test("q100: profile covers every orders column with sane bounds") {
    val rows = operators.Warehouse.q100ColumnProfile(spark, dir).collect()
    val o = Tables.load(spark, dir, "orders")
    assert(rows.map(_.getString(0)).toSet == o.columns.toSet)
    val n = o.count()
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= n)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= n)
      assert(r.getString(3) <= r.getString(4) ||
        // numeric strings compare lexically; just require both present
        (r.getString(3).nonEmpty && r.getString(4).nonEmpty))
    }
  }

  test("q102: census satisfies graph-theoretic bounds") {
    val r = operators.Warehouse.q102Triangles(spark, dir).collect().head
    val (nodes, edges, wedges, tri) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(edges <= 3 * nodes, "kNN sparsification must bound edges by k*n")
    assert(3 * tri <= wedges, "each triangle closes exactly 3 wedges")
    val c = r.getDouble(4)
    assert(c >= 0.0 && c <= 1.0)
  }

  test("q104: islands partition the orders and never exceed them") {
    val rows = operators.Warehouse.q104IntervalMerge(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (no, ni, days) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ni >= 1 && ni <= no, s"islands $ni vs orders $no")
      // every island spans >= 30 days (one order) and the cover can't
      // exceed 30 days per order (disjoint unions of [d, d+30))
      assert(days >= 30 * ni && days <= 30 * no, s"cover $days out of bounds")
    }
    // merging must actually merge somewhere
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("q105: lift is symmetric-bounded and support consistent") {
    val rows = operators.Warehouse.q105CopurchaseLift(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not canonical")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0)
    }
    val lifts = rows.map(_.getDouble(4))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b }, "not sorted")
  }

  test("q106: linear credit mass equals the number of attributed purchases") {
    import org.apache.spark.sql.functions._
    val df = operators.Warehouse.q106LinearAttribution(spark, dir)
    val creditMass = df.agg(sum("credit")).collect().head.getDouble(0)
    // each purchase with >= 1 in-window click distributes exactly 1.0
    val ev = Tables.load(spark, dir, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts").as("pts"))
    val attributed = p.join(c, Seq("user_id"))
      .filter(col("cts") < col("pts") &&
        unix_timestamp(col("pts")) - unix_timestamp(col("cts")) <= 604800L)
      .select("event_id").distinct().count()
    assert(math.abs(creditMass - attributed) < 1e-3,
      s"credit mass $creditMass != attributed purchases $attributed")
  }

  test("q107: codes are dense from 0 and frequency-monotone") {
    val rows = operators.Warehouse.q107LabelEncode(spark, dir).collect()
    val dict = rows.map(r => (r.getInt(2), r.getString(1), r.getLong(3))).distinct
    val codes = dict.map(_._1).sorted
    assert(codes.sameElements(codes.indices), "codes not dense from 0")
    val byCode = dict.sortBy(_._1).map(_._3)
    assert(byCode.zip(byCode.tail).forall { case (a, b) => a >= b },
      "frequency not monotone in code")
  }

  test("q108: slope recovers a known synthetic trend (unit regression)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // y = 3x + 7 exactly => slope 3, intercept 7 (numeric path check via
    // the same sufficient-statistics formula the operator uses)
    val rows = operators.Warehouse.q108TrendRegression(spark, dir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, "degenerate month count")
      assert(!r.isNullAt(2) && !r.isNullAt(3))
    }
    // cross-check one nation against Spark's builtin regr_slope
    val name = rows.head.getString(0)
    val builtin = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(Tables.load(spark, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .filter($"n_name" === name)
      .select($"n_name",
        ((year($"o_orderdate") - 1992) * 12 + month($"o_orderdate") - 1)
          .cast("double").as("x"),
        $"o_totalprice")
      .groupBy($"n_name", $"x").agg(sum($"o_totalprice").as("y"))
      .groupBy($"n_name").agg(expr("regr_slope(y, x)").as("sl"))
      .collect().head.getDouble(1)
    assert(math.abs(rows.head.getDouble(2) - builtin) < 1e-3,
      s"slope ${rows.head.getDouble(2)} vs builtin $builtin")
  }

  test("q101: every stratum is sampled and rates are quota-consistent") {
    val rows = operators.Warehouse.q101StratifiedSample(spark, dir).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, rs) =>
      val (n, rate) = (rs.head.getLong(2), rs.head.getDouble(3))
      assert(rate > 0 && rate <= 1.0)
      // the draw is binomial(n, rate): allow a wide deterministic band
      assert(rs.length <= n, s"$lang sampled more than the stratum")
      rs.foreach(r => assert(r.getDouble(4) < r.getDouble(3) + 1e-6,
        s"$lang kept a row with u >= rate"))
    }
  }

  test("q110: correlation matrix is bounded and self-consistent") {
    val rows = operators.Warehouse.q110CorrMatrix(spark, dir).collect()
    assert(rows.length == 9, "3 flags x 3 pairs expected")
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr $c out of [-1,1]")
    }
    // revenue is derived from price => near-1; price is qty-independent
    // in the synthetic data => near-0 (both regimes must show up)
    assert(rows.filter(_.getString(2) == "price_rev").forall(_.getDouble(3) > 0.9))
    assert(rows.filter(_.getString(2) == "qty_price").forall(r =>
      math.abs(r.getDouble(3)) < 0.5))
  }

  test("q111: funnel stages chain exactly and dedup genuinely drops") {
    val rows = operators.Warehouse.q111CurationFunnel(spark, dir).collect()
      .sortBy(_.getString(0))
    assert(rows.length == 3)
    // stage k's rows_out is stage k+1's rows_in
    assert(rows(0).getLong(2) == rows(1).getLong(1))
    assert(rows(1).getLong(2) == rows(2).getLong(1))
    rows.foreach(r => assert(r.getLong(3) == r.getLong(1) - r.getLong(2)))
    assert(rows(0).getLong(3) > 0, "dedup stage dropped nothing (vacuous)")
  }

  test("q112: nearest choice beats the rejected direction") {
    val rows = operators.AsOf.q112NearestClick(spark, dir).collect()
    assert(rows.nonEmpty)
    val dirs = rows.filter(!_.isNullAt(4)).map(_.getString(4)).toSet
    assert(dirs == Set("back", "fwd"), s"both directions must occur: $dirs")
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val gap = r.getLong(3)
      if (r.getString(4) == "back") assert(gap <= 0) else assert(gap > 0)
    }
  }

  test("q109: streamed interval join equals the batch range join") {
    import org.apache.spark.sql.functions._
    val streamed = streaming.StreamingOps
      .q109StreamIntervalJoin(spark, dir)
      .select("l_event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.load(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"),
        col("ts").as("cts"))
    val batch = p.join(c, col("user_id") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL 10 MINUTES") &&
        col("cts") < col("pts"))
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, "stream-stream join lost or invented matches")
  }

  test("q113: entities partition the record universe with one canonical each") {
    val out = pipeline.FuzzyMatch.q113EntityResolution(spark, dir).collect()
    assert(out.nonEmpty)
    val byCanon = out.groupBy(_.getString(1))
    byCanon.foreach { case (canon, rs) =>
      assert(rs.count(_.getBoolean(3)) == 1, s"$canon: != 1 canonical record")
      assert(rs.forall(_.getLong(2) == rs.length),
        s"$canon: entity_size disagrees with member count")
      assert(rs.map(_.getString(0)).min == canon,
        s"$canon is not the lexicographic min of its entity")
    }
    // fuzzy matches must actually merge records somewhere
    assert(out.exists(_.getLong(2) > 1), "no multi-record entity (vacuous)")
    // every q56 pair landed in one entity
    val pairs = pipeline.FuzzyMatch.q56FuzzyNames(spark, dir).collect()
    val canonOf = out.map(r => r.getString(0) -> r.getString(1)).toMap
    pairs.foreach { p =>
      assert(canonOf(p.getString(0)) == canonOf(p.getString(1)),
        s"pair ${p.getString(0)} ~ ${p.getString(1)} split across entities")
    }
  }

  test("q120: streaming dedup of a doubled source equals the single table") {
    val out = streaming.StreamingOps.q120StreamDedup(spark, dir).collect()
    val base = Tables.load(spark, dir, "events").count()
    assert(out.length == base, s"dedup emitted ${out.length} of $base")
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "duplicate event_id survived")
  }

  test("q121: sparse cosine agrees with q19's near-dup families") {
    val sparse = operators.Similarity.q121SparseCosine(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sparse.nonEmpty, "no sparse-cosine pairs (vacuous)")
    val minhash = operators.Dedup.q19DedupMinhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the two metrics are different, but the strong near-dup clusters
    // must substantially overlap: most minhash pairs rank as cosine pairs
    val overlap = sparse.intersect(minhash).size.toDouble
    assert(overlap / minhash.size > 0.5,
      s"sparse cosine found only $overlap of ${minhash.size} minhash pairs")
  }

  test("q103: every reported span is genuinely cross-document") {
    val rows = operators.Dedup.q103SharedSpans(spark, dir).collect()
    assert(rows.nonEmpty, "no shared spans found (vacuous)")
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, "span not cross-document")
      assert(r.getLong(2) >= r.getLong(1), "occurrences < documents")
      assert(r.getString(0).split(" ").length == 8, "span not 8 words")
    }
  }

  test("q108: a single-month nation reports null slope, never NaN") {
    import spark.implicits._
    // gate data has no single-month nation, so the n_months > 1 guard
    // (zero OLS denominator) was never exercised
    val tmp = java.nio.file.Files.createTempDirectory("trend-edge").toString
    Seq((1L, "ONEMON"), (2L, "TWOMON")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    Seq((11L, 1L), (22L, 2L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq(
      (11L, "1995-03-01", java.math.BigDecimal.valueOf(100.0)),
      (11L, "1995-03-20", java.math.BigDecimal.valueOf(150.0)), // same month
      (22L, "1995-03-01", java.math.BigDecimal.valueOf(100.0)),
      (22L, "1995-04-01", java.math.BigDecimal.valueOf(200.0)))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = operators.Warehouse.q108TrendRegression(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    val one = got("ONEMON")
    assert(one.getLong(1) == 1 && one.isNullAt(2) && one.isNullAt(3),
      "single-month nation must report null slope/intercept")
    val two = got("TWOMON")
    assert(two.getLong(1) == 2 && !two.isNullAt(2),
      "two-month nation must report a slope")
  }

  test("q156: an all-event max duration drives survival to exactly 0") {
    import spark.implicits._
    // d == n_risk at the tail: log(0) would be silently skipped by the
    // window sum (wrong non-zero survival) without the guard
    val tmp = java.nio.file.Files.createTempDirectory("km-edge").toString
    Seq(
      (1L, "1998-07-01"), (1L, "1998-07-06"), // dur 5, event
      (2L, "1998-07-01"), (2L, "1998-07-10")) // dur 9, event (last, d==n)
      .toDF("o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val rows = operators.Warehouse.q156SurvivalKm(spark, tmp).collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 5 && rows(0).getDouble(4) == 0.5)
    assert(rows(1).getInt(0) == 9 && rows(1).getDouble(4) == 0.0,
      "survival must be exactly 0 when everyone at risk is an event")
  }

  test("q276: quintile census covers all customers with balanced scores") {
    val rows = operators.Warehouse.q276RfmSegmentation(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val nCust = Tables.load(spark, dir, "orders")
      .select(org.apache.spark.sql.functions.col("o_custkey"))
      .distinct().count()
    assert(total == nCust, s"census $total != ordering customers $nCust")
    rows.foreach { r =>
      Seq(2, 3, 4).foreach { i =>
        assert(r.getDouble(i) >= 1.0 && r.getDouble(i) <= 5.0,
          s"${r.getString(0)}: mean score out of [1,5]")
      }
    }
    val segs = rows.map(_.getString(0)).toSet
    assert(segs.subsetOf(Set("champions", "loyal", "at_risk",
      "hibernating", "regular")))
  }

  test("q279: volume + price effects reconcile exactly to the revenue delta") {
    val rows = operators.Warehouse.q279PriceVolumeBridge(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val recon = r.getDouble(4) + r.getDouble(5)
      assert(math.abs(recon - r.getDouble(3)) < 0.01,
        s"${r.getString(0)}: bridge ${recon} != delta ${r.getDouble(3)}")
    }
  }

  test("q284: the FILTER clause agrees with the CASE-WHEN encoding") {
    import org.apache.spark.sql.functions._
    val got = operators.SqlSurface.q284FilterClause(spark, dir).collect()
    val want = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
          .as("n_finished"))
      .orderBy(col("o_orderpriority")).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getLong(1) == w.getLong(1) && g.getLong(2) == w.getLong(2))
    }
  }

  test("q287: classes partition the catalog and A carries ~80% with few parts") {
    val rows = operators.Warehouse.q287AbcClassification(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("A", "B", "C"))
    val nTotal = rows.values.map(_.getLong(1)).sum
    val nParts = Tables.load(spark, dir, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_partkey"))
      .distinct().count()
    assert(nTotal == nParts, "classes must partition the sold catalog")
    val revTotal = rows.values.map(_.getDouble(2)).sum
    val aShare = rows("A").getDouble(2) / revTotal
    assert(aShare <= 0.8 + 1e-6, "A is capped at 80% by construction")
    assert(aShare > 0.5, s"A must carry the bulk, got $aShare")
    assert(rows("A").getDouble(3) < rows("A").getDouble(2) / revTotal,
      "Pareto: A's part share must undercut its revenue share")
  }

  test("q275: survivorship rules pick the decorated name and fill every attribute") {
    import org.apache.spark.sql.functions._
    val rows = operators.Warehouse.q275GoldenRecord(spark, dir).persist()
    val n = Tables.load(spark, dir, "part").count()
    assert(rows.count() == n, "one golden record per entity")
    // longest-string rule: the decorated variant ("The ... Inc.") is
    // always the longest, so every golden name carries the decoration
    assert(rows.filter(!col("golden_name").startsWith("The ")).count() == 0)
    // most-recent-non-null: brand and type exist in >=2 sources each,
    // so no golden attribute may be null
    assert(rows.filter(col("golden_brand").isNull ||
      col("golden_type").isNull || col("golden_size").isNull).count() == 0)
    // completeness: every entity sees exactly 8 of 12 attribute slots
    // (brand null in src1, type null in src2, size null in src2+src3)
    assert(rows.filter(col("completeness") =!= 0.666667).count() == 0,
      "every entity sees 8/12 slots")
    rows.unpersist(false)
  }
}
