package graft

import org.scalatest.funsuite.AnyFunSuite

/** q220's sampled-slice contract (round-10 verdict ask #1): the
  * band-geometry gauge runs BOTH verify arms inside a fixed md5-ranked
  * doc slice, so its cost is O(cap) at any corpus size. This spec locks
  * (a) that a cap that BINDS on the test corpus still yields a nonzero
  * truth set — the gauge keeps measuring something, and (b) the recall
  * floor under sampling: the 4-band/2-row geometry finds every sampled
  * truth pair it finds corpus-wide. Values at binding caps on sf0.001:
  * cap=300 → (9 truth, recall 1.0, prec 0.9), cap=1000 (non-binding,
  * slice = corpus) → (28 truth, recall 1.0, prec 0.93).
  */
class LshGaugeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q220 gauge with a BINDING doc cap keeps a nonzero truth set and the recall floor") {
    val r = operators.Dedup.lshQualityGauge(spark, dir, 300).head()
    assert(r.getAs[Long]("n_truth") > 0, "sampled slice lost the truth set")
    assert(r.getAs[Double]("recall") >= 0.9,
      s"sampled recall floor broken: ${r.getAs[Double]("recall")}")
    assert(r.getAs[Double]("prec") >= 0.5)
  }

  test("q220 gauge at the production cap (slice = corpus at this SF) holds the same floor") {
    val r = operators.Dedup.q220LshQuality(spark, dir).head()
    assert(r.getAs[Long]("n_truth") > 0)
    assert(r.getAs[Double]("recall") >= 0.9,
      s"recall floor broken: ${r.getAs[Double]("recall")}")
  }
}
