package graft

import org.apache.spark.sql.catalyst.plans.logical.{
  GlobalLimit, LocalLimit, Window => LogicalWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Locks in the physical-plan properties the 100 TB design depends on
  * (PLANS.md) so a refactor can't silently regress them: filter pushdown
  * reaching the scan, column pruning, broadcast dim joins, and the
  * absence of cross products outside the two documented baselines.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def physicalPlan(name: String): String = {
    val q = Registry.all.find(_.name == name).get
    q.fn(spark, dir).queryExecution.executedPlan.toString
  }

  test("q01: ship-date filter is pushed to the parquet scan") {
    val plan = physicalPlan("q01_pricing_summary")
    assert(plan.contains("PushedFilters: ["), plan.linesIterator.take(5).mkString("\n"))
    assert(plan.contains("l_shipdate"), "pushed filter should reference l_shipdate")
  }

  test("q02: column pruning — orders scan reads only the 2 needed columns") {
    val plan = physicalPlan("q02_revenue_by_nation")
    val orderScans = plan.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("o_custkey"))
    assert(orderScans.exists(l => !l.contains("o_orderdate") && !l.contains("o_comment")),
      "orders ReadSchema should exclude unreferenced columns")
  }

  test("q02: dim joins broadcast, no sort-merge join") {
    val plan = physicalPlan("q02_revenue_by_nation")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q69: bloom probe evaluates scan-side, exact join stays broadcast") {
    val plan = physicalPlan("q69_bloom_prune_join")
    assert(plan.contains("might_contain"),
      "the bloom probe must appear in the physical plan")
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"))
    // the probe must prune the SCAN, not a shuffled intermediate: in the
    // top-down text plan, no Exchange may sit between the Filter carrying
    // might_contain and the fact scan below it
    val lines = plan.linesIterator.toSeq
    val probeIdx = lines.indexWhere(_.contains("might_contain"))
    val scanIdx = lines.indexWhere(_.contains("Scan parquet"), probeIdx)
    assert(probeIdx >= 0 && scanIdx > probeIdx,
      "probe filter should sit directly over a parquet scan")
    assert(!lines.slice(probeIdx + 1, scanIdx).exists(_.contains("Exchange")),
      "bloom probe must prune the scan, not a shuffled intermediate")
  }

  test("q70: MG summary aggregates partially — no raw-stream shuffle") {
    val plan = physicalPlan("q70_heavy_hitters")
    // ObjectHashAggregate with a partial_misra_gries stage proves the
    // summary combines map-side: the shuffle carries k counters/task
    assert(plan.contains("partial_misra_gries") ||
      plan.contains("misra_gries"), "MG aggregate missing from plan")
    assert(plan.contains("ObjectHashAggregate"),
      "TypedImperativeAggregate should plan as ObjectHashAggregate")
  }

  test("q100: the distinct-count Expand pass stays hash-aggregated") {
    // r14 optimization lock: string min/max buffers are not
    // HashAggregate-mutable, so fusing them with the count_distincts
    // sort-aggregated the Expand(x7)-multiplied table (a full sort of
    // 7x|orders| wide rows). The split keeps every aggregate ABOVE the
    // Expand long-buffered (hash), leaving the string pass on the
    // un-expanded scan. In the plan text the Expand subtree prints
    // before the min/max branch, so no SortAggregate may precede it.
    val plan = physicalPlan("q100_column_profile")
    val lines = plan.linesIterator.toSeq
    val expandIdx = lines.indexWhere(_.contains("Expand"))
    assert(expandIdx >= 0, "expected an Expand for the count_distincts")
    assert(!lines.take(expandIdx).exists(_.contains("SortAggregate")),
      "SortAggregate over the Expand subtree — the r14 split regressed")
  }

  test("only the documented baselines use a cartesian product") {
    // q22 (brute-force ANN ground truth) is crossJoin BY DESIGN, q53
    // re-runs it as the recall harness's truth side, and q75's exact
    // same-metric L2 truth is the same ground-truth role for PQ; every
    // other registered query must be free of cartesian/broadcast-nested-
    // loop products (q21/q29/q45 etc. must stay blocked/banded joins)
    val offenders = Registry.all
      .filterNot(q => Set("q22_ann_brute_force", "q53_ann_recall",
        "q75_pq_recall", "q137_ivfpq",
        // q148: two bounded products — channel-removal variants × the
        // |states|²-row transition matrix, and the 1-row base-absorption
        // scalar attached back for the effect division; the event stream
        // itself is touched once, in the keyed transition count
        "q148_markov_attribution",
        // q154: the coalition algebra is all bounded non-equi products —
        // the 4-row channel domain self-paired for indexes, the 1-row n
        // attach, and bitmask subset joins over the 2^n=16-row spine;
        // the event stream is touched once, in the keyed mask rollup
        "q154_shapley_attribution").contains(q.name))
      .flatMap { q =>
        val plan =
          try q.fn(spark, dir).queryExecution.executedPlan.toString
          catch { case _: Throwable => "" }
        if (plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")) Some(q.name) else None
      }
    // Documented intentional products only:
    //  - q45/q54 centroid scoring: broadcast nested-loop n x k with tiny
    //    broadcast k (the IVF coarse-quantizer shape)
    //  - q80/q82: crossJoin(broadcast(<1-row aggregate>)) — attaching a
    //    driver-scalar (count-min sketch / corpus avgdl) without a collect
    //  - q81: non-equi `<` self-pairing of the per-event-type sketch
    //    aggregate (5 rows) — pair enumeration over a bounded key domain
    //  - q88: crossJoin(broadcast(<1-row vocab count>)) — scalar attach
    //  - q91: broadcast k-centroid scoring, the q45 coarse-quantizer shape
    //  - q98: 3 broadcast PRF query vectors scored against the corpus
    //    (the q45 coarse-quantizer shape) + q82's avgdl scalar attach
    //  - q102/q105/q116: crossJoin of 1-row census aggregates (scalar
    //    attach); q118: 1-row page-boundary broadcast under a keyset
    //    predicate (deliberately non-equi)
    //  - q136: per-round crossJoin(broadcast(<1-row top pair>)) — the
    //    learned merge attached to the vocabulary table (scalar attach);
    //    q152 applies the same per-round merge attach on the encode side
    //  - q141: crossJoin(broadcast(<1-row bad/good totals>)) onto the
    //    bin table (scalar attach)
    //  - q161: broadcast k-centroid scoring of the frozen base-trained
    //    codebook (the q45/q91 coarse-quantizer shape, ≤2 MB broadcast)
    //  - q162: two 1-row scalar attaches (gram totals onto the B-row
    //    ratio table; the q88 TakeOrdered keep boundary onto the scores)
    //  - q170: crossJoin(broadcast(<1-row per-dim scale array>)) — the
    //    SQ8 scale vector attached to the encoder (scalar attach)
    //  - q171: the q170 scale attach + the q53/q98 shape (32 broadcast
    //    sampled queries scored against the corpus, O(cap·n))
    //  - q175: the q171 gauge shape for the binary tier (32 broadcast
    //    sampled queries popcount-scored against the corpus, O(cap·n))
    //  - q173: 6-anchor × range(10) member construction (bounded
    //    product) + the q161 broadcast-codebook scoring shape + two
    //    1-row base-stat scalar attaches
    //  - q199: crossJoin(broadcast(<1-row digit-count total>)) onto the
    //    9-row digit table (scalar attach)
    //  - q188: crossJoin(broadcast(<1-row class totals>)) onto the
    //    vocabulary-sized NB weight table (scalar attach)
    //  - q189: crossJoin(broadcast(<1-row corpus total>)) onto the
    //    20-row per-source table (scalar attach)
    //  - q205: bucket-level suffix-max self-join (≤ max_chars/256 rows
    //    per side) + survivor dominance anti-join (bucket-bounded set)
    //  - q206: crossJoin(broadcast(<1-row watermark-cut scalar>))
    //  - q207: two 1-row scalar attaches (token total N, bigram total B)
    //  - q211: crossJoin(broadcast(<1-row grand total N>)) onto the
    //    15-row contingency-cell table (scalar attach)
    //  - q212: crossJoin(broadcast(<1-row era totals>)) onto the
    //    cumulative cell table (scalar attach)
    //  - q219: bounded 64×16 sign-matrix build (range crossJoin) + the
    //    q22/q171 shape: pair enumeration over the fixed %100 sample
    //  - q214: two 1-row scalar attaches (series total + mean divisor;
    //    the |S| peak used for the change-point flag)
    //  - q221: global-grain crossJoin(broadcast(<1-row exact count>))
    //    onto the 1-row merged-sketch table (scalar attach)
    //  - q222: the q91 shape: broadcast-k centroid scoring pass (k=5)
    //  - q225: crossJoin(broadcast(<1-row weight/doc totals>)) onto the
    //    20-row per-source stratum table (scalar attach)
    //  - q100: crossJoin of TWO 1-row aggregates (the hash-aggregated
    //    null/distinct-count pass × the string min/max pass the r14
    //    optimization split out of the Expand subtree) — a 1×1 product
    //  - q254: crossJoin of TWO 1-row scalar aggregates (order-level and
    //    lineitem-level sufficient statistics) — a 1×1 product
    //  - q264: crossJoin of the 1-row point-estimate aggregate with the
    //    1-row bootstrap-CI aggregate — a 1×1 product
    //  - q266: PAVA's minimax runs on bounded non-equi products of the
    //    ~11-row discount-bin table (|B|³ rows at any corpus size); the
    //    fact table is touched once, in the bin groupBy
    //  - q268: crossJoin(broadcast(<1-row global covariance stats>))
    //    onto the 5-row per-segment table (scalar attach)
    //  - q270: crossJoin(broadcast(<1-row seasonal grand mean>)) onto
    //    the 12-row month-of-year profile (scalar attach)
    //  - q274: crossJoin(broadcast(<1-row center/limit stats>)) onto
    //    the monthly series (the q214 scalar-attach shape)
    //  - q277: crossJoin(broadcast(<1-row series moments>)) onto the
    //    12-row lag table (scalar attach)
    //  - q278: the 1-row mean attach onto the monthly series + the
    //    1×1 counts×flips assembly
    //  - q280: crossJoin(broadcast(<1-row global n/X>)) onto the
    //    customer revenue table (scalar attach)
    //  - q282: crossJoin(broadcast(<1-row totals>)) onto the 10-row
    //    decile table (scalar attach)
    //  - q283: crossJoin(broadcast(<1-row doc count>)) onto the
    //    vocabulary table (scalar attach)
    //  - q286: crossJoin(broadcast(<1-row global rate>)) onto the
    //    brand table (scalar attach)
    //  - q287: crossJoin(broadcast(<1-row revenue total>)) onto the
    //    cumulative-share table (scalar attach)
    //  - q292: the q161/q163 frozen-codebook shape — broadcast
    //    k-centroid scoring of base and delta (two q45-shaped passes)
    //    plus the Lloyd trainer's bounded sample×k products
    //  - q293: q162's two scalar attaches against the base-frozen
    //    model (gram totals; the TakeOrdered budget boundary)
    //  - q324: q309's waterfilling shape re-priced in tokenizer
    //    tokens — the same 1-row capped-stats scalar attach onto the
    //    |langs|-row table
    //  - q309: crossJoin(broadcast(<1-row capped-prefix stats>)) onto
    //    the |langs|-row capacity table (scalar attach)
    //  - q312: the q53/q98 shape — the broadcast held-out test set
    //    scored against the training corpus (O(tests·n), the exact
    //    closed form's required distance matrix) + the 1-row n_train
    //    scalar attach
    //  - q313: bins²-bounded products — the 10×10 kernel spine, the
    //    1-row histogram-total and transport-cost scalar attaches; the
    //    corpus is touched once, in the length-bucket groupBy
    //  - q316: crossJoin(broadcast(<1-row count total>)) onto the
    //    vocabulary table per M-step normalization (scalar attach,
    //    three times: seed, pruned, final)
    assert(offenders.toSet.subsetOf(Set("q45_ivf_ann", "q54_ivf_multiprobe",
      "q80_countmin_freq", "q81_kmv_overlap", "q82_bm25", "q88_bigram_lm",
      "q100_column_profile",
      "q91_kmeans_assign", "q98_rrf_hybrid", "q102_triangles",
      "q105_copurchase_lift", "q116_fk_audit", "q118_keyset_pagination",
      "q121_sparse_cosine", "q136_bpe_train", "q152_bpe_encode",
      "q141_woe_binning", "q144_join_size_estimate", "q161_index_append",
      "q162_dsir_resample", "q170_scalar_quant", "q171_sq8_recall",
      "q173_drift_gauge", "q175_bq_recall",
      "q188_nb_quality", "q189_token_budget_mixture", "q199_benford",
      "q205_skyline", "q206_stream_outer_join", "q207_pmi_collocations",
      "q211_chi2_independence", "q212_ks_test", "q214_cusum_changepoint",
      "q219_jl_projection", "q221_sketch_rollup", "q222_silhouette",
      "q225_neyman_allocation", "q254_cluster_sample",
      "q264_poisson_bootstrap", "q266_isotonic_calibration",
      "q268_cuped", "q270_seasonal_decomp",
      "q274_xmr_control_chart", "q277_acf", "q278_runs_test",
      "q280_theil_decomposition", "q282_cumulative_gains",
      "q283_term_burstiness", "q286_wilson_interval",
      "q287_abc_classification",
      "q292_incremental_semdedup", "q293_incremental_dsir",
      "q309_unimax_allocation", "q312_knn_shapley",
      "q313_sinkhorn_ot", "q316_unigram_lm",
      "q324_tokenizer_unimax")),
      s"unexpected cross products in: $offenders")
  }

  test("no unbounded global window in any registered query") {
    // A Window with an EMPTY partitionSpec plans as Exchange
    // SinglePartition + full sort on ONE task — the deep-pagination /
    // global-row_number anti-pattern that becomes the bottleneck at
    // 100x data. (A blanket "no Exchange SinglePartition" physical lint
    // would false-positive on every scalar aggregate's legitimate
    // 1-row-per-task final stage, so this lints the OPTIMIZED LOGICAL
    // plan instead.) A global window is tolerated only when its input
    // subtree contains a Limit — i.e. the window ranks a top-k that a
    // parallel TakeOrderedAndProject already reduced to k rows — or the
    // query is on the documented allowlist below.
    // Every entry's global window runs over a BOUNDED-cardinality input
    // (class domain / vocabulary / calendar), or is a documented exact
    // baseline whose stated scale path is a sketch — never the raw
    // data-scaled stream.
    val allowed = Set(
      // q59: global min over the per-LANGUAGE count table (|langs| rows)
      "q59_mixture_sample",
      // q70: global sum over the vocabulary-sized exact-count table —
      // the validation baseline; at corpus scale only the MG branch runs
      "q70_heavy_hitters",
      // q72: documented single-sort exact-decile baseline (its docstring
      // states the scale path: q68's GK sketch computes the same cuts)
      "q72_equidepth_deciles",
      // q90: global cumulative-weight window over the stratum-weight
      // table (|strata| rows), not the fact stream
      "q90_weighted_sample",
      // q95: trailing-7-day window over one KMV sketch per DAY —
      // calendar-bounded (a year of data = 365 rows)
      "q95_rolling_distinct",
      // q107: dictionary ranked by frequency — vocabulary-sized input,
      // broadcast back; never the fact table
      "q107_label_encode",
      // q156: risk-set and survival cumulations run over the distinct-
      // DURATION table — calendar-bounded (days between dates), a
      // few thousand rows at any corpus size (the q95 argument)
      "q156_survival_km",
      // q210: reference-era decile edges via the q72 ntile device —
      // the same documented single-sort exact baseline (its docstring
      // states the scale path: q68's GK sketch yields the same cuts);
      // everything downstream of the 9 edge scalars is scan-local
      "q210_psi_drift",
      // q264: nearest-rank walk over the 32-row bootstrap-replicate
      // table — the input is the REPLICATE-count grain (R=32 at any
      // corpus size), never the fact stream
      "q264_poisson_bootstrap",
      // q270: centered-MA trend window over the MONTHLY grain (~80
      // rows at any corpus size — the q95/q156 calendar-bounded
      // argument); the fact table is touched once, in the month groupBy
      "q270_seasonal_decomp",
      // q282: cumulative walk over the 10-row decile census — the
      // input grain is the decile count, never the customer stream
      "q282_cumulative_gains",
      // q309: UniMax waterfilling sort/prefix windows run over the
      // per-LANGUAGE capacity table (|langs| rows — the q59/q90
      // bounded-dimension argument); the corpus is touched exactly
      // once, in the lang-token groupBy
      "q309_unimax_allocation",
      // q324: the same waterfilling windows over the same |langs|-row
      // table, priced from q318's economics aggregate
      "q324_tokenizer_unimax")
    val offenders = Registry.all.filterNot(q => allowed(q.name)).flatMap { q =>
      val bad =
        try q.fn(spark, dir).queryExecution.optimizedPlan.collect {
          case w: LogicalWindow if w.partitionSpec.isEmpty &&
            w.child.collect {
              case g: GlobalLimit => g
              case l: LocalLimit  => l
            }.isEmpty => w
        }
        catch { case _: Throwable => Nil }
      if (bad.nonEmpty) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded global windows (Exchange SinglePartition at scale) in: $offenders")
  }
}
