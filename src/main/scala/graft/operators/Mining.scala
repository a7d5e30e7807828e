package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Graph/text mining extensions (round 9, second half): sketch-powered
  * graph distance profiles and graph-ranked keyword extraction — the
  * analyses a training-data pipeline runs to CHARACTERIZE a corpus
  * (how connected is the entity graph? what terms anchor it?) before
  * spending GPU-hours on it.
  *
  * Reference grounding: the reference pipeline publishes relationship
  * graphs between companies and metrics (`DAG:60–78`, the mart layer)
  * and its docs site renders a lineage DAG; these operators are the
  * corpus-scale generalization of that "how does everything relate"
  * surface, re-expressed Spark-first.
  */
object Mining {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** The customer–supplier bipartite graph both directions (same edge
    * set as q89/q140 — one graph, many analyses).
    */
  private def csEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e0 = t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      .join(t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("src"),
        concat(lit("s"), $"l_suppkey").as("dst"))
      .distinct()
    e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
  }

  private val HyperBallHops = 3

  /** q231: HYPERBALL (Boldi–Rosa–Vigna, WSDM'11 shape) — the
    * neighborhood function N(h) = |{(u,v) : dist(u,v) <= h}| estimated
    * with one HLL sketch PER NODE, iterated: S_0(u) = {u},
    * S_h(u) = S_{h-1}(u) ∪ ⋃_{(u,w)∈E} S_{h-1}(w). Each round is ONE
    * shuffle (edges ⋈ sketches, hll_union_agg by dst) and the state is
    * O(nodes · sketch) — never O(pairs). That is the whole point: the
    * EXACT pair set is quadratic in reachable pairs (this 3-hop
    * bipartite graph saturates toward n² pairs), so at 100 TB only the
    * sketch arm survives; the exact arm here is the verification
    * harness, same honest split as q32/q68. Spark 4's DataSketches HLL
    * (`hll_sketch_agg`/`hll_union_agg`) is deterministic for a fixed
    * input set (register maxima are merge-order-free), so the ±10%
    * flag is stable; only (hop, exact_pairs, flag) cross to the oracle,
    * which recomputes the exact closure by unrolled CTE and pins the
    * flag TRUE — a >10% sketch error on any hop breaks the hash.
    */
  private def hyperballRun(s: SparkSession, dir: String,
      withExact: Boolean): Seq[(Int, Long, Long)] = {
    import s.implicits._
    val edges = csEdges(s, dir).persist()
    // approx arm: one HLL register file per node
    var sk = edges.select($"src".as("node")).distinct()
      // lgK=9: 512 registers ≈ 0.6 KB serialized — the sketch rides
      // every edge through the per-hop shuffle, so sketch BYTES are the
      // cost driver (lgK=12 measured 8× slower for no flag headroom:
      // per-node sd ~4.6% vs the 10% gate, and hop-3 saturation
      // correlates the per-node errors rather than compounding them)
      .groupBy($"node").agg(hll_sketch_agg($"node", lit(9)).as("sk"))
      .localCheckpoint()
    // exact arm (verification harness; quadratic by design — see doc)
    var pairs = edges.select($"src".as("node")).distinct()
      .select($"node", $"node".as("member"))
      .localCheckpoint()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    def record(h: Int): Unit = {
      val approx = sk.agg(sum(hll_sketch_estimate($"sk"))).as[Long].head()
      val exact = if (withExact) pairs.count() else -1L
      rows += ((h, exact, approx))
    }
    record(0)
    for (h <- 1 to HyperBallHops) {
      sk = edges.join(sk.withColumnRenamed("node", "src"), Seq("src"))
        .select($"dst".as("node"), $"sk")
        .unionByName(sk)
        .groupBy($"node").agg(hll_union_agg($"sk").as("sk"))
        .localCheckpoint()
      if (withExact)
        pairs = edges.join(pairs.withColumnRenamed("node", "src"), Seq("src"))
          .select($"dst".as("node"), $"member")
          .unionByName(pairs)
          .distinct()
          .localCheckpoint()
      record(h)
    }
    edges.unpersist()
    rows.toSeq
  }

  def q231Hyperball(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = hyperballRun(s, dir, withExact = true)
      .toDF("hop", "exact_pairs", "approx_pairs")
    out.select($"hop", $"exact_pairs",
        (abs($"approx_pairs" - $"exact_pairs") <=
          $"exact_pairs" * 0.10).as("within_tol"))
      .orderBy($"hop")
  }

  /** The production arm alone — per-hop sketch estimates with no exact
    * closure: O(nodes · sketch) state, one shuffle per hop, at ANY
    * scale. [[graft.ScaleSmoke]] measures THIS (the exact arm is the
    * test-scale verification harness and is quadratic by design — the
    * same truth-vs-production split as q53's fixed query sample).
    */
  def hyperballSketchOnly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    hyperballRun(s, dir, withExact = false)
      .toDF("hop", "exact_pairs", "approx_pairs")
      .select($"hop", $"approx_pairs").orderBy($"hop")
  }

  private val q231Sql = {
    def iter(prev: String, out: String) =
      s"""$out AS (
         |  SELECT DISTINCT node, member FROM (
         |    SELECT e.dst AS node, p.member FROM e JOIN $prev p ON e.src = p.node
         |    UNION ALL SELECT node, member FROM $prev))""".stripMargin
    val chain = (1 to HyperBallHops)
      .map(i => iter(s"p${i - 1}", s"p$i")).mkString(",\n")
    val counts = (0 to HyperBallHops)
      .map(i => s"SELECT $i AS hop, CAST(count(*) AS BIGINT) AS exact_pairs FROM p$i")
      .mkString("\nUNION ALL ")
    s"""WITH e0 AS (
       |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
       |p0 AS (SELECT DISTINCT src AS node, src AS member FROM e),
       |$chain
       |SELECT hop, exact_pairs, TRUE AS within_tol FROM ($counts)
       |ORDER BY hop""".stripMargin
  }

  private val TrIters = 3
  private val TrDamping = 0.85

  /** q232: TEXTRANK keyword extraction (Mihalcea–Tarau '04) — PageRank
    * over the token co-occurrence graph (adjacent-token window, the
    * paper's w=2). The graph build is SCAN-LOCAL: adjacent pairs come
    * from zipping each doc's token array with its own tail
    * (`arrays_zip(slice, slice)`) — no posexplode self-join, no
    * shuffle until the vocabulary-keyed groupBy, and the vocabulary is
    * the bounded thing at 100 TB (edges aggregate to V², V = distinct
    * tokens, while the token stream is the corpus). Weighted PageRank
    * then runs q89's discipline: per-round localCheckpoint, round(,10)
    * pinning, contributions proportional to edge weight / weighted
    * degree. Oracle: same tokenization + unrolled 3-CTE recursion.
    */
  def q232Textrank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.loadSpread(s, dir, "documents")
      .select(split($"text", " ").as("ts"))
    // adjacent pairs, zero-shuffle: zip ts[0..n-2] with ts[1..n-1]
    val e0 = toks
      .select(explode(arrays_zip(
        slice($"ts", lit(1), greatest(size($"ts") - 1, lit(0))),
        slice($"ts", lit(2), greatest(size($"ts") - 1, lit(0))))).as("p"))
      .select($"p.0".as("a"), $"p.1".as("b"))
      .filter($"a" =!= "" && $"b" =!= "")
    val edges = e0.unionByName(e0.select($"b".as("a"), $"a".as("b")))
      .groupBy($"a".as("src"), $"b".as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
      .persist()
    val wdeg = edges.groupBy($"src").agg(sum($"w").as("wdeg"))
    val n = wdeg.count().toDouble
    var pr = wdeg.select($"src".as("node"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to TrIters) {
      pr = edges
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(wdeg, Seq("src"))
        .select($"dst", ($"pr" * $"w" / $"wdeg").as("contrib"))
        .groupBy($"dst")
        .agg(sum($"contrib").as("in_pr"))
        .select($"dst".as("node"),
          round(lit((1 - TrDamping) / n) + lit(TrDamping) * $"in_pr", 10)
            .as("pr"))
        .localCheckpoint()
    }
    edges.unpersist()
    val top = pr.orderBy($"pr".desc, $"node".asc).limit(20)
    val w = Window.orderBy($"pr".desc, $"node".asc)
    top.withColumn("rank", row_number().over(w))
      .select($"rank", $"node".as("keyword"), round($"pr", 8).as("textrank"))
      .orderBy($"rank")
  }

  private val q232Sql = {
    def iter(prev: String, out: String) =
      s"""$out AS (
         |  SELECT e.dst AS node,
         |    round((SELECT (1 - $TrDamping) / n FROM n) +
         |      $TrDamping * sum(p.pr * e.w / d.wdeg), 10) AS pr
         |  FROM e JOIN $prev p ON e.src = p.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst)""".stripMargin
    val chain = (1 to TrIters).map(i => iter(s"p${i - 1}", s"p$i")).mkString(",\n")
    s"""WITH toks AS (
       |  SELECT string_split(text, ' ') AS ts FROM documents),
       |pairs0 AS (
       |  SELECT ts[i] AS a, ts[i + 1] AS b
       |  FROM toks, unnest(range(1, len(ts))) AS r(i)
       |  WHERE ts[i] <> '' AND ts[i + 1] <> ''),
       |e AS (
       |  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM (
       |    SELECT a AS src, b AS dst FROM pairs0
       |    UNION ALL SELECT b AS src, a AS dst FROM pairs0)
       |  GROUP BY src, dst),
       |deg AS (SELECT src, sum(w) AS wdeg FROM e GROUP BY src),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
       |p0 AS (SELECT src AS node, (SELECT 1.0 / n FROM n) AS pr FROM deg),
       |$chain
       |SELECT rank, node AS keyword, textrank FROM (
       |  SELECT node, round(pr, 8) AS textrank,
       |    row_number() OVER (ORDER BY pr DESC, node ASC) AS rank
       |  FROM p$TrIters)
       |WHERE rank <= 20
       |ORDER BY rank""".stripMargin
  }

  /** q233: HOLT LINEAR-TREND FORECAST (double exponential smoothing,
    * alpha = beta = 1/2), integer-exact: the monthly revenue series is
    * summed as DECIMAL cents, and each smoothing step is
    * l_t = floor((y_t + l_{t-1} + b_{t-1}) / 2),
    * b_t = floor((l_t - l_{t-1} + b_{t-1}) / 2) — halving with an
    * explicit floor, so both engines walk the identical integer lattice
    * (quantization 1 cent; no float accumulation anywhere). The fold
    * runs as a higher-order `aggregate` over each segment's sorted
    * month array: the recurrence is inherently sequential IN TIME, so
    * the scalable axis is SERIES (millions of keys fold in parallel,
    * each series is bounded — 80 months here), exactly how a production
    * forecaster shards. One shuffle total (the monthly rollup); the
    * fold itself is scan-local. Oracle: recursive CTE walking the same
    * lattice. At true 100 TB cent-sums the double-floored halving would
    * move to DECIMAL division; doubles are exact to 2^53 cents and
    * documented as such.
    */
  def q233HoltForecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment".as("segment"),
        date_format($"o_orderdate", "yyyy-MM").as("m"))
      .agg((sum($"o_totalprice".cast(
        org.apache.spark.sql.types.DecimalType(18, 2))) * 100)
        .cast("long").as("y"))
    val series = monthly.groupBy($"segment")
      .agg(sort_array(collect_list(struct($"m", $"y"))).as("ser"))
    val st = aggregate($"ser",
      struct(lit(0L).as("l"), lit(0L).as("b"), lit(0).as("n")),
      (acc, x) => {
        val y = x.getField("y")
        val lnew = floor((y + acc.getField("l") + acc.getField("b"))
          .cast("double") / 2.0).cast("long")
        val bnew = floor((lnew - acc.getField("l") + acc.getField("b"))
          .cast("double") / 2.0).cast("long")
        when(acc.getField("n") === 0,
          struct(y.as("l"), lit(0L).as("b"), lit(1).as("n")))
          .otherwise(struct(lnew.as("l"), bnew.as("b"),
            (acc.getField("n") + 1).as("n")))
      })
    series.select($"segment", st.as("st"))
      .select($"segment", $"st.n".as("n_months"),
        $"st.l".as("level_cents"), $"st.b".as("trend_cents"),
        ($"st.l" + $"st.b").as("fcst1_cents"),
        ($"st.l" + lit(2L) * $"st.b").as("fcst2_cents"))
      .orderBy($"segment")
  }

  private val q233Sql =
    """WITH RECURSIVE monthly AS (
      |  SELECT c_mktsegment AS segment, strftime(o_orderdate, '%Y-%m') AS m,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |s AS (
      |  SELECT segment, m, y,
      |    row_number() OVER (PARTITION BY segment ORDER BY m) AS rn
      |  FROM monthly),
      |rec AS (
      |  SELECT segment, rn, l, b FROM (
      |    SELECT segment, rn, y AS l, CAST(0 AS BIGINT) AS b
      |    FROM s WHERE rn = 1)
      |  UNION ALL
      |  SELECT s.segment, s.rn,
      |    CAST(floor((s.y + rec.l + rec.b) / 2.0) AS BIGINT) AS l,
      |    CAST(floor((CAST(floor((s.y + rec.l + rec.b) / 2.0) AS BIGINT)
      |      - rec.l + rec.b) / 2.0) AS BIGINT) AS b
      |  FROM rec JOIN s ON s.segment = rec.segment AND s.rn = rec.rn + 1),
      |fin AS (
      |  SELECT segment, rn, l, b,
      |    row_number() OVER (PARTITION BY segment ORDER BY rn DESC) AS rr
      |  FROM rec)
      |SELECT segment, CAST(rn AS INTEGER) AS n_months, l AS level_cents,
      |  b AS trend_cents, l + b AS fcst1_cents, l + 2 * b AS fcst2_cents
      |FROM fin WHERE rr = 1 ORDER BY segment""".stripMargin

  private val WalkSteps = 3

  /** q235: RANDOM-WALK CORPUS GENERATION (DeepWalk/node2vec p=q=1
    * shape) — the step that turns a graph into token sequences for
    * embedding training. One walk starts at every node; each step picks
    * the next hop from the current node's sorted neighbor list by an
    * md5-derived index (`md5(cur:walk:step) % degree`) — NO RNG, so
    * re-running, resharding, or backfilling the corpus regenerates
    * byte-identical walks (the q50/q90 determinism contract extended to
    * sequences). Plan: neighbor lists materialize once (one groupBy),
    * then each step is ONE equi-join of the O(nodes) frontier against
    * the adjacency — walk count scales the frontier, never the
    * adjacency, and the path string is carried, not re-derived. The
    * oracle replays the identical walks by unrolled CTE with DuckDB's
    * md5 — one wrong neighbor index anywhere breaks every downstream
    * path hash.
    */
  def q235RandomWalks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = csEdges(s, dir)
    val nbrs = edges.groupBy($"src")
      .agg(sort_array(collect_list($"dst")).as("nb"),
        count(lit(1)).as("deg"))
      .persist()
    var walk = nbrs.select($"src".as("walk_id"), $"src".as("cur"),
      $"src".as("path"))
    for (step <- 1 to WalkSteps) {
      walk = walk
        .join(nbrs.withColumnRenamed("src", "cur"), Seq("cur"))
        .select($"walk_id",
          element_at($"nb",
            (conv(substring(md5(concat($"cur", lit(":"), $"walk_id",
              lit(":"), lit(step))), 1, 8), 16, 10).cast("long") % $"deg")
              .cast("int") + 1).as("cur"),
          $"path")
        .select($"walk_id", $"cur",
          concat($"path", lit(">"), $"cur").as("path"))
    }
    nbrs.unpersist()
    walk.select($"walk_id", $"path").orderBy($"walk_id")
  }

  private val q235Sql = {
    def iter(prev: String, out: String, step: Int) =
      s"""$out AS (
         |  SELECT w.walk_id,
         |    nb.nb[CAST(('0x' || substr(md5(w.cur || ':' || w.walk_id ||
         |      ':' || $step), 1, 8))::BIGINT % nb.deg AS INTEGER) + 1] AS cur,
         |    w.path || '>' || nb.nb[CAST(('0x' || substr(md5(w.cur || ':' ||
         |      w.walk_id || ':' || $step), 1, 8))::BIGINT % nb.deg
         |      AS INTEGER) + 1] AS path
         |  FROM $prev w JOIN nbrs nb ON nb.src = w.cur)""".stripMargin
    val chain = (1 to WalkSteps)
      .map(i => iter(s"w${i - 1}", s"w$i", i)).mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
       |nbrs AS (
       |  SELECT src, list(dst ORDER BY dst) AS nb,
       |    CAST(count(*) AS BIGINT) AS deg
       |  FROM e GROUP BY src),
       |w0 AS (SELECT src AS walk_id, src AS cur, src AS path FROM nbrs),
       |$chain
       |SELECT walk_id, path FROM w$WalkSteps ORDER BY walk_id""".stripMargin
  }

  private val NegDraws = 1000
  private val NegBuckets = 256L

  /** q236: WEIGHTED NEGATIVE SAMPLING (word2vec's unigram^0.75 table)
    * — integer-exact and distributed. Per-token weight is
    * floor(sqrt(cf·floor(sqrt(cf)))) ≈ cf^(3/4): IEEE sqrt is
    * correctly rounded and the floors pin both engines to the same
    * integer, so no libm drift. The cumulative table comes from the
    * [[GlobalRank.withGlobalPrefixSums]] device (range partition +
    * per-partition window + P-row driver offsets — NEVER a
    * single-partition global window), giving each token a [lo, hi)
    * slot in the weight line. Draws are md5-inverse-CDF points on that
    * line; the draw→token lookup is a BANDED range join (both sides
    * explode to the fixed-width buckets they overlap, equi-join on
    * bucket, then the exact containment predicate) — the q36 range-join
    * shape, so the matcher stays an equi-join at any vocabulary size.
    * The oracle walks the same weight line with a window cumsum.
    */
  def q236NegativeSampling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cf = Tables.loadSpread(s, dir, "documents")
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token").agg(count(lit(1)).as("cf"))
    val wtd = cf.select($"token",
      floor(sqrt($"cf" * floor(sqrt($"cf")))).cast("long").as("w"))
    val ranges = GlobalRank.withGlobalPrefixSums(
      wtd, Seq("w" -> "hi"), $"token")
      .select($"token", $"w", ($"hi" - $"w").as("lo"), $"hi")
      .persist()
    val total = ranges.agg(max($"hi")).as[Long].head()
    val bucket = math.max(1L, total / NegBuckets)
    val draws = s.range(NegDraws.toLong).toDF("i")
      .select($"i",
        (conv(substring(md5(concat(lit("neg:"), $"i")), 1, 13), 16, 10)
          .cast("long") % total).as("t"))
      .withColumn("bkt", ($"t" / bucket).cast("long"))
    val banded = ranges
      .select($"token", $"lo", $"hi",
        explode(sequence(($"lo" / bucket).cast("long"),
          (($"hi" - 1) / bucket).cast("long"))).as("bkt"))
    val out = draws.join(banded, Seq("bkt"))
      .filter($"t" >= $"lo" && $"t" < $"hi")
      .groupBy($"token")
      .agg(count(lit(1)).as("n_draws"))
      .join(ranges.select($"token", $"w"), Seq("token"))
      .select($"token", $"w", $"n_draws")
      .orderBy($"token")
    val mat = out.localCheckpoint()
    ranges.unpersist()
    mat
  }

  private val q236Sql =
    s"""WITH cf AS (
       |  SELECT token, count(*) AS cf FROM (
       |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token <> '' GROUP BY token),
       |w AS (
       |  SELECT token,
       |    CAST(floor(sqrt(cf * floor(sqrt(cf)))) AS BIGINT) AS w
       |  FROM cf),
       |c AS (SELECT token, w, sum(w) OVER (ORDER BY token) AS hi FROM w),
       |r AS (SELECT token, w, hi - w AS lo, hi FROM c),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM w),
       |d AS (
       |  SELECT i, ('0x' || substr(md5('neg:' || i), 1, 13))::BIGINT %
       |    (SELECT total FROM tot) AS t
       |  FROM range(0, $NegDraws) rr(i))
       |SELECT r.token, r.w, CAST(count(*) AS BIGINT) AS n_draws
       |FROM d JOIN r ON d.t >= r.lo AND d.t < r.hi
       |GROUP BY r.token, r.w
       |ORDER BY token""".stripMargin

  private val CfTopK = 5
  private val CfMinSupport = 2L

  /** q237: ITEM-ITEM COLLABORATIVE FILTERING — cosine similarity over
    * order baskets (Sarwar et al. '01, the production recommender
    * baseline). Candidate pairs come from WITHIN-BASKET pairing only
    * (self-join on the order key with `i < j`): per-basket cost is
    * bounded by basket size squared — ~7 lines per order here and
    * bounded everywhere real — so the pair stream is O(orders ·
    * basket²), linear in the fact table, never |items|². Cosine
    * normalizes by per-item basket counts (broadcast-sized dimension
    * join-back), support-filters noise pairs, and takes top-K per
    * anchor with a PARTITIONED rank window (per-anchor groups are
    * support-bounded; no global sort anywhere). The oracle replays the
    * identical algebra in SQL; IEEE sqrt + round(8) pins the float.
    */
  def q237ItemCf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val op = t(s, dir, "lineitem")
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      .persist()
    val n = op.groupBy($"p").agg(count(lit(1)).as("n"))
    val co = op.join(op.withColumnRenamed("p", "q"), Seq("o"))
      .filter($"p" < $"q")
      .groupBy($"p", $"q").agg(count(lit(1)).as("c"))
      .filter($"c" >= CfMinSupport)
    val sym = co.unionByName(
      co.select($"q".as("p"), $"p".as("q"), $"c"))
    val scored = sym
      .join(n.withColumnRenamed("p", "pp").withColumnRenamed("n", "np"),
        $"p" === $"pp")
      .join(n.withColumnRenamed("p", "qq").withColumnRenamed("n", "nq"),
        $"q" === $"qq")
      .select($"p".as("item"), $"q".as("neighbor"), $"c".as("co_orders"),
        round($"c" / sqrt($"np" * $"nq"), 8).as("cosine"))
    val w = Window.partitionBy($"item")
      .orderBy($"cosine".desc, $"neighbor".asc)
    val out = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= CfTopK)
      .select($"item", $"rank", $"neighbor", $"co_orders", $"cosine")
      .orderBy($"item", $"rank")
      .localCheckpoint()
    op.unpersist()
    out
  }

  private val q237Sql =
    s"""WITH op AS (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |n AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM op GROUP BY p),
       |co AS (
       |  SELECT a.p, b.p AS q, CAST(count(*) AS BIGINT) AS c
       |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
       |  GROUP BY a.p, b.p
       |  HAVING count(*) >= $CfMinSupport),
       |sym AS (
       |  SELECT p, q, c FROM co UNION ALL SELECT q AS p, p AS q, c FROM co),
       |scored AS (
       |  SELECT sym.p AS item, sym.q AS neighbor, sym.c AS co_orders,
       |    round(sym.c / sqrt(np.n * nq.n), 8) AS cosine
       |  FROM sym JOIN n np ON sym.p = np.p JOIN n nq ON sym.q = nq.p)
       |SELECT item, rank, neighbor, co_orders, cosine FROM (
       |  SELECT item, neighbor, co_orders, cosine,
       |    row_number() OVER (PARTITION BY item
       |      ORDER BY cosine DESC, neighbor ASC) AS rank
       |  FROM scored)
       |WHERE rank <= $CfTopK
       |ORDER BY item, rank""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q231_hyperball", Seq("EXT-graph", "EXT-approx"),
      "HyperBall neighborhood function: per-node HLL sketches iterated one shuffle per hop, exact-closure harness pins the ±10% flag",
      q231Hyperball, Some(q231Sql)),
    GraftQuery("q232_textrank", Seq("EXT-text", "EXT-graph"),
      "TextRank keywords: scan-local adjacent-pair graph, weighted PageRank over the bounded vocabulary, top-20",
      q232Textrank, Some(q232Sql)),
    GraftQuery("q233_holt_forecast", Seq("EXT-olap", "A2", "EXT-window"),
      "Holt linear-trend forecast: integer-exact floored-halving smoothing folded scan-local per segment series, h=1/2 forecasts",
      q233HoltForecast, Some(q233Sql)),
    GraftQuery("q235_random_walks", Seq("EXT-graph", "EXT-text", "EXT-sample"),
      "deterministic random-walk corpus (DeepWalk shape): md5-indexed next hops over sorted adjacency, one join per step",
      q235RandomWalks, Some(q235Sql)),
    GraftQuery("q236_negative_sampling", Seq("EXT-text", "EXT-sample", "EXT-approx"),
      "word2vec negative-sampling table: integer-exact cf^0.75 weights, global-prefix-sum weight line, banded inverse-CDF range join",
      q236NegativeSampling, Some(q236Sql)),
    GraftQuery("q237_item_cf", Seq("EXT-similarity", "EXT-olap", "J1", "A2"),
      "item-item collaborative filtering: within-basket pair stream, cosine over basket counts, support-filtered top-5 per item",
      q237ItemCf, Some(q237Sql)))
}
