package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-9 curation-QA operators (q185–q190)
  * — properties the oracle hash-compare cannot establish on its own
  * (both engines could be wrong the same way).
  */
class CurationQaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q185: every ticket yields each PII type; redaction leaves zero residual") {
    import spark.implicits._
    val out = operators.Curation.q185PiiRedact(spark, dir).persist()
    assert(out.count() > 0)
    // detectors must fire: the synthesized ticket embeds one of each type
    assert(out.filter($"n_email" < 1 || $"n_phone" < 1 || $"n_custid" < 1)
      .count() == 0, "a detector missed a planted PII instance")
    // completeness: re-scanning the redacted text finds nothing
    assert(out.filter($"residual" =!= 0L).count() == 0)
    // placeholders actually present
    assert(out.filter(!($"redacted".contains("[EMAIL]") &&
      $"redacted".contains("[PHONE]") && $"redacted".contains("[CUST]")))
      .count() == 0)
    out.unpersist(false)
  }

  test("q186: winnowing guarantee — a doc paired with itself shares all fingerprints") {
    import spark.implicits._
    // pairs are strictly upper-triangular and meet the share threshold
    val out = operators.Curation.q186WinnowFingerprints(spark, dir).persist()
    assert(out.filter($"doc_a" >= $"doc_b").count() == 0)
    assert(out.filter($"shared" < operators.Curation.WinMinShared).count() == 0)
    out.unpersist(false)
  }

  test("q187: no near-dup cluster straddles splits; members inherit the rep's split") {
    import spark.implicits._
    val out = operators.Curation.q187LeakageSafeSplit(spark, dir).persist()
    // one split per rep — the leakage-safety property itself
    val leaked = out.groupBy($"rep").agg(countDistinct($"split").as("k"))
      .filter($"k" > 1).count()
    assert(leaked == 0, "a cluster spans multiple splits")
    // every doc's split equals its representative row's split
    val reps = out.select($"doc_id".as("rep"), $"split".as("rep_split"))
    assert(out.join(reps, "rep").filter($"split" =!= $"rep_split").count() == 0)
    // all three splits materialize and cover every doc
    assert(out.select($"split").distinct().count() == 3)
    out.unpersist(false)
  }

  test("q188: label follows score sign; both classes non-empty; finite scores") {
    import spark.implicits._
    val out = operators.Curation.q188NbQuality(spark, dir).persist()
    assert(out.filter($"nb_good" =!= ($"score" >= 0)).count() == 0)
    assert(out.filter($"weak_good").count() > 0)
    assert(out.filter(!$"weak_good").count() > 0)
    assert(out.filter($"score".isNull || isnan($"score")).count() == 0)
    // the classifier should mostly agree with its teacher on sf0.001
    val n = out.count().toDouble
    assert(out.filter($"disagree").count() / n < 0.5, "classifier inverted")
    out.unpersist(false)
  }

  test("q189: epoch cap and budget arithmetic hold per source") {
    import spark.implicits._
    val out = operators.Curation.q189TokenBudgetMixture(spark, dir).persist()
    assert(out.filter($"epochs" > operators.Curation.MixMaxEpochs).count() == 0)
    assert(out.filter($"achieved_tokens" >
      $"tokens" * operators.Curation.MixMaxEpochs + 1).count() == 0)
    // fulfillment is (0, 1 + eps]: achieved never exceeds target by more
    // than the terminal rounding
    assert(out.filter($"fulfillment" <= 0 || $"fulfillment" > 1.000001).count() == 0)
    out.unpersist(false)
  }

  test("q309: UniMax waterfilling — budget exhausted, caps respected, uncapped shares uniform") {
    import spark.implicits._
    val rows = operators.Curation.q309UnimaxAllocation(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = totalTokens * 3 / 2
    // 1. the allocation spends exactly the budget (waterfilling's whole
    //    point over q189's fixed-target shortfall)
    val spent = rows.map(_.getAs[Double]("alloc")).sum
    assert(math.abs(spent - budget) < 1e-3, s"spent $spent vs budget $budget")
    rows.foreach { r =>
      val cap = r.getAs[Long]("capacity").toDouble
      val alloc = r.getAs[Double]("alloc")
      // 2. no language exceeds its epochs capacity
      assert(alloc <= cap + 1e-9, s"${r.getAs[String]("lang")} over capacity")
      // 3. capped rows get exactly their capacity
      if (r.getAs[Boolean]("capped")) assert(alloc == cap)
      // 4. epochs_used consistency
      assert(math.abs(r.getAs[Double]("epochs_used") -
        alloc / r.getAs[Long]("n_tokens")) < 1e-5)
    }
    // 5. all uncapped languages share one uniform allocation, and it is
    //    >= every capped capacity (max-min fairness: nobody capped would
    //    have preferred the uniform share)
    val (capped, uncapped) = rows.partition(_.getAs[Boolean]("capped"))
    assert(uncapped.nonEmpty, "budget < total capacity yet nothing uncapped")
    val shares = uncapped.map(_.getAs[Double]("alloc")).distinct
    assert(shares.length == 1, s"uncapped shares not uniform: ${shares.toSeq}")
    if (capped.nonEmpty)
      assert(capped.map(_.getAs[Long]("capacity").toDouble).max <= shares.head + 1e-9)
    // 6. the cap binds on this corpus (redistribution branch exercised)
    assert(capped.nonEmpty, "no language capped — waterfilling untested")
  }

  test("q190: the first document is fully novel; fractions in [0,1]; totals consistent") {
    import spark.implicits._
    val out = operators.Curation.q190NgramNovelty(spark, dir).persist()
    val first = out.orderBy($"doc_id").limit(1).collect()(0)
    assert(first.getAs[Long]("novel") == first.getAs[Long]("n_tri"),
      "earliest doc must introduce every one of its trigrams")
    assert(out.filter($"novelty" < 0 || $"novelty" > 1).count() == 0)
    assert(out.filter($"novel" > $"n_tri").count() == 0)
    out.unpersist(false)
  }
}
