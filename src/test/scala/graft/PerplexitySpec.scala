package graft

import org.scalatest.funsuite.AnyFunSuite

/** q306 semantics locked against an in-memory brute force (independent
  * of BOTH engines, so a shared arithmetic mistake cannot hide): the
  * add-one bigram LM's counts, the per-doc mean NLL, and the tercile
  * rule are rebuilt in plain Scala maps and must agree with the query
  * to the rounded 6 decimals; buckets must be score-monotone
  * (max(head) ≤ min(middle) ≤ min(tail) boundaries) and tercile-sized.
  */
class PerplexitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q306 matches a brute-force bigram LM; buckets are monotone terciles") {
    import spark.implicits._
    val out = operators.TextAnalysis.q306CcnetPerplexity(spark, dir).collect()
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", org.apache.spark.sql.functions.lower($"text"))
      .as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split(" ", -1).toSeq) }
      .filter(_._2.size >= 2)
    // reference LM
    val ref = docs.filter(_._1 % operators.TextAnalysis.PplRefMod == 0)
    val c1 = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val c2 = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    ref.foreach { case (_, w) =>
      w.foreach(t => c1(t) += 1)
      w.sliding(2).foreach { case Seq(a, b) => c2((a, b)) += 1; case _ => () }
    }
    val vocab = c1.size.toDouble
    val truth = docs.map { case (id, w) =>
      val nlls = w.sliding(2).collect { case Seq(a, b) =>
        -math.log((c2((a, b)) + 1).toDouble / (c1(a) + vocab))
      }.toSeq
      id -> ((nlls.size.toLong,
        math.round(nlls.sum / nlls.size * 1e6) / 1e6))
    }.toMap
    assert(out.length == truth.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nb, nll) = truth(id)
      assert(r.getAs[Long]("n_bigrams") == nb, s"doc $id: bigram count")
      assert(math.abs(r.getAs[Double]("avg_nll") - nll) < 2e-6,
        s"doc $id: nll ${r.getAs[Double]("avg_nll")} vs brute $nll")
    }
    // tercile rule: sizes follow rk*3 <= n / <= 2n, boundaries monotone
    val byBucket = out.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getAs[Double]("avg_nll"))).toMap
    val n = out.length
    assert(byBucket("head").length == n / 3)
    assert(byBucket("head").length + byBucket("middle").length == 2 * n / 3)
    assert(byBucket("head").max <= byBucket("middle").min + 1e-12)
    assert(byBucket("middle").max <= byBucket("tail").min + 1e-12)
  }

  /** Tokenized docs, shared by the LM brute forces below. */
  private def loadDocs(): Array[(Long, Seq[String])] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", org.apache.spark.sql.functions.lower($"text"))
      .as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split(" ", -1).toSeq) }
      .filter(_._2.size >= 2)
  }

  private def addOneModel(slice: Array[(Long, Seq[String])]) = {
    val c1 = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val c2 = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    slice.foreach { case (_, w) =>
      w.foreach(t => c1(t) += 1)
      w.sliding(2).foreach { case Seq(a, b) => c2((a, b)) += 1; case _ => () }
    }
    val vocab = c1.size.toDouble
    (a: String, b: String) => -math.log((c2((a, b)) + 1).toDouble / (c1(a) + vocab))
  }

  test("q307 matches a brute-force two-model CE difference; selects the lowest quartile") {
    val out = operators.TextAnalysis.q307MooreLewis(spark, dir).collect()
    val docs = loadDocs()
    val nllIn = addOneModel(docs.filter(_._1 % 3 == 0))
    val nllGen = addOneModel(docs.filter(_._1 % 3 == 1))
    val pool = docs.filter(_._1 % 3 == operators.TextAnalysis.MlPoolMod)
    assert(out.length == pool.length, "one scored row per pool doc, none from training slices")
    val truth = pool.map { case (id, w) =>
      val pairs = w.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
      val di = pairs.map { case (a, b) => nllIn(a, b) }
      val dg = pairs.map { case (a, b) => nllGen(a, b) }
      val dd = pairs.map { case (a, b) => nllIn(a, b) - nllGen(a, b) }
      id -> (di.sum / di.size, dg.sum / dg.size, dd.sum / dd.size)
    }.toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (ci, cg, cd) = truth(id)
      assert(math.abs(r.getAs[Double]("ce_in") - ci) < 2e-6, s"doc $id ce_in")
      assert(math.abs(r.getAs[Double]("ce_gen") - cg) < 2e-6, s"doc $id ce_gen")
      assert(math.abs(r.getAs[Double]("ce_diff") - cd) < 2e-6, s"doc $id ce_diff")
    }
    // the Moore–Lewis cut: exactly floor(n/4) selected, and every
    // selected score <= every unselected score (rank ties impossible
    // at 6-decimal granularity on this corpus would still satisfy <=)
    val (sel, unsel) = out.partition(_.getAs[Boolean]("selected"))
    assert(sel.length == out.length / 4)
    assert(sel.map(_.getAs[Double]("ce_diff")).max <=
      unsel.map(_.getAs[Double]("ce_diff")).min + 1e-12)
    // the selection is non-vacuous both ways
    assert(sel.nonEmpty && unsel.nonEmpty)
  }

  test("q310 matches a brute-force interpolated Kneser-Ney LM; buckets are monotone terciles") {
    val out = operators.TextAnalysis.q310KneserNey(spark, dir).collect()
    val docs = loadDocs()
    val ref = docs.filter(_._1 % operators.TextAnalysis.PplRefMod == 0)
    val c2 = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    val uni = scala.collection.mutable.Set.empty[String]
    ref.foreach { case (_, w) =>
      w.foreach(uni += _)
      w.sliding(2).foreach { case Seq(a, b) => c2((a, b)) += 1; case _ => () }
    }
    val c1 = c2.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val n1pFwd = c2.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1pBwd = c2.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n1pAll = c2.size.toDouble
    val vocab = uni.size.toDouble
    val d = operators.TextAnalysis.KnDiscount
    def pcont(b: String) = (n1pBwd.getOrElse(b, 0L) + 1).toDouble / (n1pAll + vocab + 1)
    def pkn(a: String, b: String): Double = c1.get(a) match {
      case Some(ca) if ca > 0 =>
        (math.max(c2((a, b)).toDouble - d, 0.0) + d * n1pFwd(a) * pcont(b)) / ca
      case _ => pcont(b)
    }
    val truth = docs.map { case (id, w) =>
      val nlls = w.sliding(2).collect { case Seq(a, b) => -math.log(pkn(a, b)) }.toSeq
      id -> (nlls.size.toLong, nlls.sum / nlls.size)
    }.toMap
    assert(out.length == truth.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nb, nll) = truth(id)
      assert(r.getAs[Long]("n_bigrams") == nb, s"doc $id: bigram count")
      val got = r.getAs[Double]("avg_nll")
      assert(got > 0 && !got.isNaN && !got.isInfinite, s"doc $id: nll not finite-positive")
      assert(math.abs(got - nll) < 2e-6, s"doc $id: nll $got vs brute $nll")
    }
    val byBucket = out.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getAs[Double]("avg_nll"))).toMap
    val n = out.length
    assert(byBucket("head").length == n / 3)
    assert(byBucket("head").max <= byBucket("middle").min + 1e-12)
    assert(byBucket("middle").max <= byBucket("tail").min + 1e-12)
    // KN discounting must actually move mass: the discounted estimator
    // and add-one disagree on at least one doc's tercile (non-vacuity
    // of the upgrade — if they bucket identically the estimator change
    // was a no-op on this corpus)
    val addOne = operators.TextAnalysis.q306CcnetPerplexity(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(out.exists(r => addOne(r.getAs[Long]("doc_id")) != r.getAs[String]("bucket")),
      "KN and add-one produced identical tercile assignments — estimator change vacuous")
  }
}
