package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q320 (DoReMi domain reweighting) invariants: per-round weights form
  * a distribution with the smoothing floor, the trajectory is complete
  * and deterministic, and a domain whose pool looks like the in-domain
  * slice and unlike the general slice (positive excess) is upweighted
  * over a domain with zero excess.
  */
class DoremiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(docs: Seq[(Long, String, String)]): Seq[(Int, String, Long, Double, Double)] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("drm-corpus")
    docs.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    operators.Curation.q320Doremi(spark, dir.toString)
      .as[(Int, String, Long, Double, Double)].collect().toSeq
  }

  test("weights stay a smoothed distribution; positive-excess domain is upweighted; deterministic") {
    // slice layout is doc_id % 3: 0 = in-domain train, 1 = general
    // train, 2 = the scored pool. 'up' pool docs repeat the in-domain
    // pattern (low ce_in, high ce_gen -> positive excess); 'down' pool
    // docs repeat the general pattern (excess clamps to 0)
    val inPat = "alpha beta gamma delta alpha beta gamma delta alpha beta"
    val genPat = "omega psi chi phi omega psi chi phi omega psi"
    val docs =
      (0L until 30L by 3L).map(i => (i, inPat, "up")) ++
        (1L until 30L by 3L).map(i => (i, genPat, "down")) ++
        (0 until 10).map { k =>
          val id = 2L + 3L * k
          if (k % 2 == 0) (id, inPat, "up") else (id, genPat, "down")
        }
    // ensure the pool actually has members of both langs
    val pool = docs.filter(_._1 % 3 == 2)
    assert(pool.exists(_._3 == "up") && pool.exists(_._3 == "down"))

    val out = run(docs)
    val nd = out.filter(_._1 == 0).size
    assert(nd == 2, s"expected 2 domains at round 0, got $nd")
    val rounds = out.map(_._1).max
    assert(rounds == operators.Curation.DrmRounds)
    // every round: complete domain set, weights sum to 1 within the
    // 12dp-per-domain rounding, smoothing floor holds
    (0 to rounds).foreach { t =>
      val w = out.filter(_._1 == t).map(_._5)
      assert(w.size == 2)
      assert(math.abs(w.sum - 1.0) < 1e-11 * 2 + 1e-11)
      assert(w.forall(_ >= operators.Curation.DrmSmooth / 2 - 1e-12),
        s"round $t violates the smoothing floor: $w")
    }
    val fin = out.filter(_._1 == rounds).map(x => x._2 -> x._5).toMap
    assert(fin("up") > fin("down"),
      s"positive-excess domain must be upweighted: $fin")
    assert(run(docs) == out, "trainer must be deterministic")
  }
}
