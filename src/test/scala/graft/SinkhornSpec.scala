package graft

import org.scalatest.funsuite.AnyFunSuite

/** q313 semantic invariants — properties of a valid entropic transport
  * plan the oracle hash cannot establish on its own: non-negativity,
  * unit total mass, and the Sinkhorn signature — after the final
  * v-update the COLUMN marginals are exact (to solver tolerance) while
  * the rows still carry the entropic residual.
  */
class SinkhornSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q313 plan: non-negative, unit mass, column-exact / row-residual marginals") {
    val rows = operators.Curation.q313SinkhornOt(spark, dir).collect()
    assert(rows.length == operators.Curation.OtBins * operators.Curation.OtBins)
    val plan = rows.map(r => (r.getAs[Int]("i"), r.getAs[Int]("j"),
      r.getAs[Double]("plan"))).toSeq
    assert(plan.forall(_._3 >= 0.0), "negative transport mass")
    val total = plan.map(_._3).sum
    assert(math.abs(total - 1.0) < 1e-6, s"total mass $total")
    val massDe = rows.map(r => r.getAs[Int]("j") -> r.getAs[Double]("mass_de")).toMap
    val massEn = rows.map(r => r.getAs[Int]("i") -> r.getAs[Double]("mass_en")).toMap
    val colErr = massDe.keys.map(j =>
      math.abs(plan.filter(_._2 == j).map(_._3).sum - massDe(j))).max
    val rowErr = massEn.keys.map(i =>
      math.abs(plan.filter(_._1 == i).map(_._3).sum - massEn(i))).max
    // final update was v -> columns are solver-exact; rows lag behind
    assert(colErr < 1e-6, s"column marginal error $colErr")
    assert(rowErr < 0.05, s"row marginal diverged: $rowErr")
    assert(rowErr > colErr, "row residual should exceed column residual " +
      "(the Sinkhorn alternation signature)")
    // the cost is a positive scalar, constant across rows
    val costs = rows.map(_.getAs[Double]("transport_cost")).distinct
    assert(costs.length == 1 && costs.head > 0)
    // mass actually moves between buckets (off-diagonal transport) —
    // the two distributions differ, so the identity plan would be wrong
    assert(plan.filter(p => p._1 != p._2).map(_._3).sum > 0.01)
  }
}
