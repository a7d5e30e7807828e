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
}
