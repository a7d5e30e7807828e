package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-9 data-selection operators
  * (q162–q166) — properties the oracle hash-compare cannot establish
  * (both engines could be wrong the same way), checked directly against
  * the operator definitions on the deterministic sf0.001 corpus.
  */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q162: exact n/5 budget, and selection enriches the target distribution") {
    import spark.implicits._
    val out = operators.TextAnalysis.q162DsirResample(spark, dir).persist()
    val n = out.count()
    assert(out.select($"doc_id").distinct().count() == n, "doc multiplicity")
    val kept = out.filter($"keep").count()
    assert(kept == (n + 4) / 5, s"Gumbel top-k budget broken: $kept of $n")
    // importance weights must PULL: kept docs average a higher log-weight
    // than rejected ones even through the Gumbel noise...
    val Array(kw, rw) = out.groupBy($"keep").agg(avg($"logw")).orderBy($"keep".desc)
      .collect().map(_.getDouble(1))
    assert(kw > rw, s"selection ignored the importance weights: kept=$kw rej=$rw")
    // ...and the en (target) slice must be kept at a higher rate than the
    // non-target remainder — the whole point of DSIR
    val enRate = out.filter($"lang" === "en").agg(avg($"keep".cast("double")))
      .head().getDouble(0)
    val otherRate = out.filter($"lang" =!= "en").agg(avg($"keep".cast("double")))
      .head().getDouble(0)
    assert(enRate > otherRate, s"no target enrichment: en=$enRate other=$otherRate")
    out.unpersist(false)
  }

  test("q163: every cell keeps a survivor, and the keep-ranked-first member is never removed") {
    import spark.implicits._
    val out = operators.Similarity.q163SemDedup(spark, dir).persist()
    assert(out.filter($"removed").count() > 0, "prune is vacuous")
    // at least one survivor per cell — SemDeDup can never empty a cluster
    assert(out.groupBy($"cell").agg(max(!$"removed").as("hasKeep"))
      .filter(!$"hasKeep").count() == 0, "a cell lost all members")
    // the (cent_sim ASC, vec_id ASC) minimum of each cell has no
    // better-ranked neighbor by definition, so it must survive
    val first = out.groupBy($"cell")
      .agg(min(struct($"cent_sim", $"vec_id")).as("m"))
      .select($"cell", $"m.vec_id".as("vec_id"))
    assert(out.join(first, Seq("cell", "vec_id")).filter($"removed").count() == 0,
      "a cell's keep-ranked-first member was removed")
    out.unpersist(false)
  }

  test("q164: triplets are cross-label, ranked densely, non-increasing in cosine") {
    import spark.implicits._
    val out = operators.Similarity.q164HardNegatives(spark, dir).persist()
    assert(out.count() > 0)
    assert(out.filter($"anchor_label" === $"neg_label").count() == 0,
      "a same-label pair leaked into the negatives")
    val k = operators.Similarity.HardNegK
    val perAnchor = out.groupBy($"anchor_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mx"), min($"rank").as("mn"))
    assert(perAnchor.filter($"n" > k || $"mx" =!= $"n" || $"mn" =!= 1).count() == 0,
      "rank sequence not dense 1..n<=k")
    // cosine must be non-increasing along the rank order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"anchor_id").orderBy($"rank")
    assert(out.withColumn("prev", lag($"cos_sim", 1).over(w))
      .filter($"prev".isNotNull && $"prev" < $"cos_sim").count() == 0,
      "harder negative ranked below a softer one")
    out.unpersist(false)
  }

  test("q165: mined pairs form a one-to-one cross-side matching with margin over threshold") {
    import spark.implicits._
    val out = operators.Similarity.q165BitextMargin(spark, dir).persist()
    assert(out.count() > 0)
    // mutual top-1 in both directions => no endpoint repeats
    assert(out.groupBy($"src_id").count().filter($"count" > 1).count() == 0)
    assert(out.groupBy($"tgt_id").count().filter($"count" > 1).count() == 0)
    // sides are the label parity split
    val lbl = Tables.load(spark, dir, "embeddings").select($"vec_id", $"label")
    assert(out.join(lbl, out("src_id") === lbl("vec_id"))
      .filter($"label" % 2 =!= 0).count() == 0, "src side crossed parity")
    assert(out.join(lbl, out("tgt_id") === lbl("vec_id"))
      .filter($"label" % 2 =!= 1).count() == 0, "tgt side crossed parity")
    // flag consistency with the published threshold
    assert(out.filter($"mined" =!=
      ($"margin" >= operators.Similarity.MarginThreshold)).count() == 0)
    out.unpersist(false)
  }

  test("q166: flags are thresholded, benchmark-sourced, and unique per vector") {
    import spark.implicits._
    val out = operators.Similarity.q166SemanticDecontam(spark, dir).persist()
    assert(out.count() > 0, "decontamination sweep is vacuous")
    assert(out.filter($"cos_sim" < operators.Similarity.SemDecontamTau).count() == 0)
    assert(out.filter($"bench_id" % 50 =!= 3).count() == 0,
      "a non-benchmark vector reported as the contamination source")
    assert(out.select($"vec_id").distinct().count() == out.count(),
      "strongest-match dedup failed")
    out.unpersist(false)
  }

  test("q292: additive removal partition equals the direct union-wide pair vote") {
    import spark.implicits._
    val S = operators.Similarity
    val all = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(aggregate(zip_with($"v", $"v", _ * _),
        lit(0.0), _ + _)))
    val base = all.filter($"vec_id" % 10 =!= 7)
    val delta = all.filter($"vec_id" % 10 === 7)
    val cb = S.ivfCodebookOf(spark, base.select($"vec_id", $"v"), "c")
    val baseA = S.semdedupAssign(spark, base, cb).persist()
    val deltaA = S.semdedupAssign(spark, delta, cb).persist()
    val unionA = baseA.unionByName(deltaA)
    val direct = S.semdedupRemovals(unionA, unionA)
      .as[Long].collect().toSet
    val additive = S.semdedupRemovals(baseA, baseA)
      .unionByName(S.semdedupRemovals(unionA, deltaA))
      .unionByName(S.semdedupRemovals(deltaA, baseA))
      .as[Long].collect().toSet
    assert(direct == additive,
      s"partition not exact: onlyDirect=${(direct -- additive).take(5)} " +
        s"onlyAdditive=${(additive -- direct).take(5)}")
    assert(direct.nonEmpty, "vacuous: no removals on the test corpus")
    // and some removal genuinely involves the delta side (the terms the
    // production cadence runs are not vacuous either)
    val baseOnly = S.semdedupRemovals(baseA, baseA).as[Long].collect().toSet
    assert(direct != baseOnly, "delta batch changed no verdict — vacuous test corpus")
    baseA.unpersist(false); deltaA.unpersist(false)
  }

  test("q293: split featurize-and-score equals the one-pass union score; budget re-cut is global") {
    import spark.implicits._
    val T = operators.TextAnalysis
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", $"text")
    val dbBase = T.dsirDocBuckets(docs.filter($"doc_id" % 10 =!= 7)).persist()
    val lr = T.dsirModel(dbBase)
    // incremental assembly: base and delta scored in separate passes
    val split = T.dsirScore(dbBase, lr)
      .unionByName(T.dsirScore(
        T.dsirDocBuckets(docs.filter($"doc_id" % 10 === 7)), lr))
      .select($"doc_id", $"lw".cast("string"))
      .as[(Long, String)].collect().toMap
    // one-pass: the whole corpus featurized together, same frozen model
    val onePass = T.dsirScore(T.dsirDocBuckets(docs), lr)
      .select($"doc_id", $"lw".cast("string"))
      .as[(Long, String)].collect().toMap
    assert(split == onePass, "per-doc scores are not featurization-order independent")
    // the budget is GLOBAL: the union cut must differ from a base-only
    // cut on at least one base doc (delta arrivals displace base picks —
    // the part a naive per-batch top-k gets wrong)
    val unionKeep = T.dsirKeepCut(spark,
        T.dsirScore(T.dsirDocBuckets(docs), lr))
      .filter($"doc_id" % 10 =!= 7)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val baseKeep = T.dsirKeepCut(spark, T.dsirScore(dbBase, lr))
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(unionKeep != baseKeep,
      "vacuous corpus: the delta batch displaced no base pick")
    dbBase.unpersist(false)
  }
}
