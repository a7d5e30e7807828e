package graft

import org.scalatest.funsuite.AnyFunSuite

/** q312 locked against an in-memory brute force of the Jia et al.
  * closed form, plus the one property that pins the SEMANTICS (not just
  * the arithmetic): Shapley EFFICIENCY — for every test point the
  * per-pair values sum to v(D) = (#label-matches among the K nearest)/K,
  * the utility of the full training set. A sign error, an off-by-one in
  * the rank recursion, or a wrong tail term all break efficiency.
  */
class KnnShapleySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q312 matches the closed-form brute force; per-test values satisfy efficiency") {
    import spark.implicits._
    val out = operators.Similarity.q312KnnShapley(spark, dir).collect()
      .map(r => r.getAs[Long]("train_id") -> r.getAs[Double]("shapley")).toMap
    val k = operators.Similarity.ShapK
    val vecs = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
      .map { case (id, e, y) => (id, e.map(_.toDouble).toArray, y) }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val panel = vecs.map(_._1).sortBy(id => (md5hex(s"shap:$id"), id))
      .take(operators.Similarity.ShapTestN).toSet
    val tests = vecs.filter(v => panel(v._1))
    val train = vecs.filterNot(v => panel(v._1))
    val n = train.length
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    // brute-force per-train totals with the SAME pinning as the query,
    // checking efficiency per test along the way
    val totals = scala.collection.mutable.Map.empty[Long, BigDecimal].withDefaultValue(BigDecimal(0))
    tests.foreach { case (_, tv, ty) =>
      val ranked = train.map { case (id, v, y) =>
        val c = math.round(dot(v, tv) / (nrm(v) * nrm(tv)) * 1e6) / 1e6
        (id, y, c)
      }.sortBy { case (id, _, c) => (-c, id) }
      val ind = ranked.map { case (_, y, _) => if (y == ty) 1.0 else 0.0 }
      // closed form, nearest-first alpha_1..alpha_N
      val s = new Array[Double](n)
      s(n - 1) = ind(n - 1) / n
      for (i <- n - 2 to 0 by -1)
        s(i) = s(i + 1) + (ind(i) - ind(i + 1)) * math.min(k, i + 1) / (k.toDouble * (i + 1))
      // efficiency: values sum to the utility of the full training set
      val vFull = ind.take(k).sum / k
      assert(math.abs(s.sum - vFull) < 1e-9,
        s"efficiency violated: ${s.sum} vs $vFull")
      val termDec = (0 until n).map { i =>
        r12(if (i == n - 1) 0.0
        else (ind(i) - ind(i + 1)) * math.min(k, i + 1) / (k.toDouble * (i + 1)))
      }
      val tailDec = r12(ind(n - 1) / n)
      var suffix = BigDecimal(0)
      for (i <- n - 1 to 0 by -1) {
        suffix += termDec(i)
        totals(ranked(i)._1) += suffix + tailDec
      }
    }
    assert(out.size == n)
    totals.foreach { case (id, v) =>
      val expect = v.setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(id) - expect) < 1e-12, s"train $id: ${out(id)} vs $expect")
    }
    // non-vacuity: valuation separates points (both signs present —
    // harmful and helpful examples both exist on this corpus)
    assert(out.values.exists(_ > 0) && out.values.exists(_ < 0))
  }
}
