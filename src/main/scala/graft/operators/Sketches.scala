package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.SketchAggregates._

/** Mergeable-sketch query surface (round 4): count-min frequency
  * estimation and KMV distinct-set algebra. Companions to q70's
  * Misra-Gries (heavy-hitter IDENTITIES) and q32's HLL (single-set
  * cardinality): CMS answers point frequency queries for arbitrary keys,
  * KMV answers SET-ALGEBRA cardinalities (union / intersection /
  * Jaccard) that HLL alone cannot (HLL has no intersection estimator —
  * inclusion-exclusion over HLLs compounds error; KMV intersects the
  * sample itself).
  *
  * Both queries follow the q70 validation pattern: the emitted rows are
  * EXACT-branch values (DuckDB-recomputable), gated by sketch-derived
  * booleans that the deterministic hash seeds make reproducible —
  * a sketch regression flips a flag and fails the driver's hash compare.
  * At corpus scale only the sketch branch runs; the exact branch is the
  * small-SF validation baseline, same as q68's exact percentiles.
  */
object Sketches {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Depth = 5
  private val Width = 1024

  /** q80: count-min frequency estimates for per-(event_type, user)
    * event counts, validated against exact counts on the 20 heaviest
    * keys. The sketch build is ONE aggregation to a depth×width counter
    * matrix (40 KB) with pointwise-add merge — the shuffle carries
    * 32 such matrices, never the key stream; at 100 TB this is the only
    * viable per-key-rate pass when the key domain (users × types, URLs,
    * n-grams) outgrows the shuffle. Probes ride a broadcast of the one
    * sketch row. Guarantee carried by `ok`: est >= exact always
    * (counters only add — Cormode & Muthukrishnan 2005), and the
    * overcount is collision mass ~N/width per row min'd over `depth`
    * rows; 3·N/width is a ≥6σ ceiling for the min (measured overcount
    * at sf0.01: ≤ ~N/width·½ on every probed key).
    */
  def q80CountMinFreq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"event_type", $"user_id",
        concat_ws("|", $"event_type", $"user_id").as("k"))
    val sketch = ev.agg(
      countMin($"k", Depth, Width).as("sk"),
      count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"exact_cnt".desc, $"event_type".asc, $"user_id".asc)
    val top = ev.groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("exact_cnt"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 20)
    top.crossJoin(broadcast(sketch))
      .withColumn("est",
        countMinQuery($"sk", concat_ws("|", $"event_type", $"user_id"),
          Depth, Width))
      .select($"event_type", $"user_id", $"exact_cnt",
        ($"est" >= $"exact_cnt" &&
          ($"est" - $"exact_cnt") * Width <= $"n" * 3L).as("ok"))
      .orderBy($"exact_cnt".desc, $"event_type".asc, $"user_id".asc)
  }

  private val q80Sql =
    """WITH c AS (
      |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS exact_cnt
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, user_id, exact_cnt, true AS ok
      |FROM c
      |ORDER BY exact_cnt DESC, event_type, user_id
      |LIMIT 20""".stripMargin

  /** q144: JOIN-SIZE ESTIMATION from count-min sketches — the optimizer
    * statistic behind join reordering and broadcast/shuffle strategy
    * picks: |A ⋈ B on k| = Σ_k cnt_A(k)·cnt_B(k), estimated WITHOUT
    * touching the join by the CMS inner product (Cormode &
    * Muthukrishnan 2005 §4.2): dot each of the `depth` counter rows of
    * A's sketch with B's, take the min. Each side is one aggregation to
    * a 40 KB matrix — the stats collection a warehouse runs at WRITE
    * time; the estimate itself is array arithmetic on two 1-row
    * sketches. Like q80, the emitted row carries the DuckDB-recomputable
    * exact size plus the sketch's deterministic guarantees as flags:
    * sound (est >= exact — counters only add, so row dots only
    * overcount) and tight (overcount ≤ 3·N_A·N_B/width, a ≥6σ ceiling
    * on the min of `depth` independent rows). The m:n pair here
    * (events.user_id × orders.o_custkey) makes the size genuinely
    * non-trivial — neither side is a key.
    */
  def q144JoinSizeEstimate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").select($"user_id".cast("string").as("k"))
    val or = t(s, dir, "orders").select($"o_custkey".cast("string").as("k"))
    val sa = ev.agg(countMin($"k", Depth, Width).as("ca"),
      count(lit(1)).as("na"))
    val sb = or.agg(countMin($"k", Depth, Width).as("cb"),
      count(lit(1)).as("nb"))
    val rowDots = (0 until Depth).map { i =>
      aggregate(
        zip_with(slice($"ca", i * Width + 1, Width),
          slice($"cb", i * Width + 1, Width), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
    }
    val est = least(rowDots: _*)
    val exact = ev.groupBy($"k").agg(count(lit(1)).as("cna"))
      .join(or.groupBy($"k").agg(count(lit(1)).as("cnb")), "k")
      .agg(sum($"cna" * $"cnb").cast("long").as("exact_size"))
    exact.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select($"exact_size",
        (est >= $"exact_size").as("est_sound"),
        ((est - $"exact_size") * Width <= $"na" * $"nb" * 3L).as("est_tight"))
  }

  private val q144Sql =
    """WITH a AS (SELECT CAST(user_id AS VARCHAR) AS k,
      |            CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
      |b AS (SELECT CAST(o_custkey AS VARCHAR) AS k,
      |        CAST(count(*) AS BIGINT) AS c FROM orders GROUP BY 1)
      |SELECT CAST(sum(a.c * b.c) AS BIGINT) AS exact_size,
      |  true AS est_sound, true AS est_tight
      |FROM a JOIN b USING (k)""".stripMargin

  private val K = 512

  /** q81: audience-overlap cardinalities — distinct active user-days
    * per event type, pairwise intersected — via KMV set algebra. The
    * exact form is a distinct-shuffle plus a self-join of the distinct
    * sets (quadratic in types, heavy in rows); the sketch form shuffles
    * 5 sorted arrays of k hashes and does ALL pairs' union/intersection/
    * Jaccard with array ops on the driver-sized result. Estimators:
    * union = (k-1)/u_k on the k-smallest of the merged hash sets
    * (exact below saturation), Jaccard = |merged ∩ A ∩ B| / |merged|
    * (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07). k=512 gives
    * σ ≈ 1/√k ≈ 4.4%; the flags allow 12% relative (union) and 0.10
    * absolute (Jaccard) — ≥2.5σ headroom, deterministic given the fixed
    * hash seeds (measured at sf0.01: ≤5% / ≤0.04).
    */
  def q81KmvOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ud = t(s, dir, "events")
      .select($"event_type",
        concat_ws("|", $"user_id", to_date($"ts").cast("string")).as("k"))
    val sk = ud.groupBy($"event_type")
      .agg(kmv($"k", K).as("sk"), count_distinct($"k").as("exact_n"))
    val exact = ud.distinct()
    val inter = exact.as("a")
      .join(exact.as("b"), $"a.k" === $"b.k" &&
        $"a.event_type" < $"b.event_type")
      .groupBy($"a.event_type".as("ta"), $"b.event_type".as("tb"))
      .agg(count(lit(1)).as("exact_inter"))
    val norm = 1.8446744073709551616e19
    val pairs = sk.as("x").join(sk.as("y"), $"x.event_type" < $"y.event_type")
      .select(
        $"x.event_type".as("ta"), $"y.event_type".as("tb"),
        $"x.exact_n".as("exact_a"), $"y.exact_n".as("exact_b"),
        array_sort(array_union($"x.sk", $"y.sk")).as("u"))
      .withColumn("m", least(size($"u"), lit(K)))
      .withColumn("msk", slice($"u", 1, K))
      .withColumn("est_union",
        when(size($"u") < K, size($"u").cast("double"))
          .otherwise(lit(K - 1.0) /
            ((element_at($"msk", K).cast("double") + 9.223372036854775808e18)
              / norm)))
    val est = pairs.join(inter, Seq("ta", "tb"))
      .join(sk.select($"event_type".as("ta"), $"sk".as("ska")), Seq("ta"))
      .join(sk.select($"event_type".as("tb"), $"sk".as("skb")), Seq("tb"))
      .withColumn("common",
        size(array_intersect($"msk", array_intersect($"ska", $"skb"))))
      .withColumn("est_j", $"common".cast("double") / $"m")
      .withColumn("exact_union", $"exact_a" + $"exact_b" - $"exact_inter")
    est.select($"ta", $"tb", $"exact_a", $"exact_b", $"exact_inter",
        (abs($"est_union" - $"exact_union") <= $"exact_union" * 0.12)
          .as("ok_union"),
        (abs($"est_j" - $"exact_inter" / $"exact_union") <= 0.10)
          .as("ok_jaccard"))
      .orderBy($"ta", $"tb")
  }

  private val q81Sql =
    """WITH ud AS (
      |  SELECT DISTINCT event_type, user_id, CAST(ts AS DATE) AS d
      |  FROM events),
      |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n
      |      FROM ud GROUP BY 1),
      |i AS (SELECT a.event_type AS ta, b.event_type AS tb,
      |        CAST(count(*) AS BIGINT) AS exact_inter
      |      FROM ud a JOIN ud b ON a.user_id = b.user_id AND a.d = b.d
      |      WHERE a.event_type < b.event_type GROUP BY 1, 2)
      |SELECT ta, tb, na.exact_n AS exact_a, nb.exact_n AS exact_b,
      |  exact_inter, true AS ok_union, true AS ok_jaccard
      |FROM i
      |JOIN n na ON na.event_type = ta
      |JOIN n nb ON nb.event_type = tb
      |ORDER BY ta, tb""".stripMargin

  /** q95: rolling 7-day distinct users via MERGEABLE daily sketches —
    * the time-windowed form of q81's KMV algebra, and the pattern that
    * makes rolling distinct counts viable at 100 TB: one daily
    * aggregation emits a k-hash sketch per day (the only thing ever
    * stored), and every trailing window is answered by MERGING seven
    * 512-hash arrays — never by re-scanning seven days of raw events.
    * Exact trailing distinct (for the validation flag) comes from a
    * 7-day event explode + count-distinct, linear not quadratic. Below
    * saturation (n < k, the sf0.01 regime) the merged sketch is exact;
    * above it (sf0.1: ~1,500 users) the (k-1)/u_k estimator takes over —
    * the gate exercises the exact branch, the bench rides the estimator.
    */
  def q95RollingDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val norm = 1.8446744073709551616e19
    val ev = t(s, dir, "events")
      .select(datediff(to_date($"ts"), lit("1970-01-01").cast("date")).as("dn"),
        $"user_id".cast("string").as("u"))
    val daily = ev.groupBy($"dn").agg(kmv($"u", K).as("sk"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"dn").rangeBetween(-6, 0)
    val rolled = daily
      .withColumn("merged",
        array_sort(array_distinct(flatten(collect_list($"sk").over(w)))))
      .withColumn("m", least(size($"merged"), lit(K)))
      .withColumn("msk", slice($"merged", 1, K))
      .withColumn("est",
        when(size($"merged") < K, size($"merged").cast("double"))
          .otherwise(lit(K - 1.0) /
            ((element_at($"msk", K).cast("double") + 9.223372036854775808e18)
              / norm)))
      .select($"dn", $"est")
    val exact = ev
      .select(explode(sequence($"dn", $"dn" + 6)).as("wdn"), $"u")
      .groupBy($"wdn").agg(count_distinct($"u").as("exact_7d"))
    rolled.join(exact, rolled("dn") === exact("wdn"))
      .select(
        date_format(date_add(lit("1970-01-01").cast("date"), $"dn"),
          "yyyy-MM-dd").as("day"),
        $"exact_7d",
        (abs($"est" - $"exact_7d") <= $"exact_7d" * 0.12).as("ok_7d"))
      .orderBy($"day")
  }

  private val q95Sql =
    """WITH ev AS (
      |  SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
      |    CAST(user_id AS VARCHAR) AS u
      |  FROM events),
      |days AS (SELECT DISTINCT dn FROM ev),
      |exact AS (
      |  SELECT wdn, CAST(count(DISTINCT u) AS BIGINT) AS exact_7d
      |  FROM (SELECT unnest(range(dn, dn + 7)) AS wdn, u FROM ev)
      |  GROUP BY wdn)
      |SELECT strftime(DATE '1970-01-01' + INTERVAL (d.dn) DAY, '%Y-%m-%d')
      |    AS day,
      |  exact_7d, true AS ok_7d
      |FROM days d JOIN exact ON exact.wdn = d.dn
      |ORDER BY day""".stripMargin

  /** q143: grouped top-k via the [[graft.functions.SketchAggregates.TopKBy]]
    * bounded-heap aggregate — the GROUPED twin of round 5's TakeOrdered
    * rewrites. The standard `row_number() OVER (PARTITION BY ...)` +
    * `rn <= k` plan shuffles every raw order row and sorts each whole
    * group; this plan's shuffle carries one <= 5-entry heap per group
    * per task (ObjectHashAggregate partial -> final), and nothing is
    * ever sorted but the k survivors. The oracle IS the window
    * formulation — hash equality proves the heap algebra (offer/evict/
    * merge with the (ord desc, id asc) tiebreak) exactly reproduces it.
    */
  def q143TopkGroups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(topkBy($"o_totalprice", $"o_orderkey", 5).as("top"))
      .select($"o_orderstatus", explode($"top").as("e"))
      .select($"o_orderstatus", $"e.rank".as("rank"),
        $"e.id".as("o_orderkey"), $"e.ord".as("o_totalprice"))
      .orderBy($"o_orderstatus", $"rank")
  }

  private val q143Sql =
    """SELECT o_orderstatus, CAST(rank AS INTEGER) AS rank,
      |  o_orderkey, o_totalprice
      |FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_orderstatus
      |          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      |      FROM orders)
      |WHERE rank <= 5
      |ORDER BY o_orderstatus, rank""".stripMargin

  // ---------------------------------------------------------------- q221

  /** KMV sketch size for the rollup tiles (smaller than q81's 512: the
    * tile cube multiplies sketches by grain cardinality, and the exact
    * oracle means no tolerance needs the extra resolution).
    */
  private[graft] val RollK = 128
  // (RollK-1) * 2^52, the estimator numerator over 52-bit hashes; both
  // factors are powers-of-two-scaled small ints, so the double is exact.
  private[graft] val RollNum = (RollK - 1).toDouble * 4503599627370496.0

  /** q221: re-aggregatable distinct-count TILES — the sketch-cube
    * pattern that makes "distinct customers by any grain" answerable at
    * 100 TB without rescanning the fact table. One pass builds a KMV
    * sketch per finest-grain tile (nation × order-year); every coarser
    * grain — per nation, per year, global — is computed by MERGING tile
    * arrays (smallest-K of the union), shuffling O(tiles × K) longs and
    * never touching a raw row again. The oracle is the strong form of
    * the mergeability claim: DuckDB computes each grain's smallest-K
    * DIRECTLY from the raw data, so the hash compare proves the merge
    * is exactly associative (merged tiles ≡ direct sketch), not just
    * approximately right. Hashes are 52-bit md5 prefixes (exact in
    * doubles and in both engines' integer parsers — the q219 device);
    * the tile build is the bounded-heap topk_by aggregate over the
    * distinct (tile, key) stream, so no group is ever materialized or
    * sorted whole. `exact_n` is the small-SF validation baseline, same
    * contract as q80/q81.
    */
  def q221SketchRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer").select($"c_custkey", $"c_nationkey")
    val base = t(s, dir, "orders")
      .select($"o_custkey", year(to_date($"o_orderdate")).as("yr"))
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".as("nat"), $"yr", $"o_custkey".as("ck"))
      .distinct()
      .withColumn("h",
        conv(substring(md5($"ck".cast("string")), 1, 13), 16, 10)
          .cast("long"))
      .persist()
    val tiles = base.groupBy($"nat", $"yr")
      .agg(topkBy((-$"h").cast("double"), $"h", RollK).as("tk"))
      .select($"nat", $"yr",
        expr("transform(tk, x -> x.id)").as("sk"))
    // merged grain = smallest K of the tile-sketch union: the only data
    // touched past the tile build is tiles × K longs.
    def grain(label: String, key: Column, by: Seq[String]): DataFrame = {
      val byCols = by.map(col)
      val merged = tiles.groupBy(byCols: _*)
        .agg(count(lit(1)).as("n_tiles"),
          slice(array_sort(array_distinct(flatten(collect_list($"sk")))),
            1, RollK).as("sk"))
      val exact = base.groupBy(byCols: _*)
        .agg(count_distinct($"ck").as("exact_n"))
      val joined = if (by.isEmpty) merged.crossJoin(broadcast(exact))
        else merged.join(exact, by)
      joined.select(lit(label).as("grain"), key.as("gkey"), $"n_tiles",
        size($"sk").as("m"),
        when(size($"sk") < RollK, size($"sk").cast("double"))
          .otherwise(round(lit(RollNum) / element_at($"sk", RollK), 4))
          .as("est"),
        $"exact_n")
    }
    grain("nation", $"nat".cast("string"), Seq("nat"))
      .unionAll(grain("year", $"yr".cast("string"), Seq("yr")))
      .unionAll(grain("all", lit("ALL"), Seq.empty))
      .orderBy($"grain", $"gkey")
  }

  private val q221Sql = {
    // per-grain block: s = direct smallest-K stats, t = tile count,
    // e = exact distinct — all from hb, joined on the grain key (cross
    // join of 1-row tables for the global grain).
    def grainSql(label: String, keyExpr: String, by: String,
        tileExpr: String) = {
      val sel = if (by.isEmpty) "" else s"$by, "
      val part = if (by.isEmpty) "" else s"PARTITION BY $by "
      val grp = if (by.isEmpty) "" else s"GROUP BY $by"
      val joinT = if (by.isEmpty) "CROSS JOIN" else "JOIN"
      val onT = if (by.isEmpty) "" else s" USING ($by)"
      s"""SELECT '$label' AS grain, $keyExpr AS gkey, t.n_tiles,
        |  CAST(least(s.mtot, $RollK) AS INTEGER) AS m,
        |  CASE WHEN s.mtot < $RollK THEN CAST(s.mtot AS DOUBLE)
        |       ELSE round($RollNum / s.kth, 4) END AS est,
        |  e.exact_n
        |FROM (
        |  SELECT ${sel}count(*) AS mtot,
        |    max(CASE WHEN rn <= $RollK THEN h END) AS kth
        |  FROM (SELECT ${sel}h,
        |          row_number() OVER (${part}ORDER BY h) AS rn
        |        FROM (SELECT DISTINCT ${sel}h FROM hb))
        |  $grp) s
        |$joinT (
        |  SELECT ${sel}CAST(count(*) AS BIGINT) AS n_tiles
        |  FROM (SELECT DISTINCT ${sel}$tileExpr FROM hb) $grp) t$onT
        |$joinT (
        |  SELECT ${sel}CAST(count(DISTINCT ck) AS BIGINT) AS exact_n
        |  FROM hb $grp) e$onT""".stripMargin
    }
    s"""WITH base AS (
      |  SELECT DISTINCT c_nationkey AS nat,
      |    year(CAST(o_orderdate AS DATE)) AS yr, o_custkey AS ck
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |hb AS (
      |  SELECT nat, yr, ck,
      |    ('0x' || substr(md5(CAST(ck AS VARCHAR)), 1, 13))::BIGINT AS h
      |  FROM base)
      |${grainSql("nation", "CAST(s.nat AS VARCHAR)", "nat", "yr")}
      |UNION ALL
      |${grainSql("year", "CAST(s.yr AS VARCHAR)", "yr", "nat")}
      |UNION ALL
      |${grainSql("all", "'ALL'", "", "nat, yr")}
      |ORDER BY grain, gkey""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q221_sketch_rollup", Seq("EXT-approx", "EXT-olap", "A2"),
      "KMV sketch-cube rollup: per-(nation,year) tiles merged to coarser grains, merge-associativity proven against direct sketches",
      q221SketchRollup, Some(q221Sql)),
    GraftQuery("q143_topk_groups", Seq("EXT-approx", "A2", "W2"),
      "grouped top-5 via bounded-heap topk_by aggregate (O(groups x k) shuffle, no group sort)",
      q143TopkGroups, Some(q143Sql)),
    GraftQuery("q80_countmin_freq", Seq("EXT-approx", "A2"),
      "count-min point-frequency estimates vs exact on the heavy keys",
      q80CountMinFreq, Some(q80Sql)),
    GraftQuery("q81_kmv_overlap", Seq("EXT-approx", "J1"),
      "KMV distinct-set algebra: per-type audience overlap cardinalities",
      q81KmvOverlap, Some(q81Sql)),
    GraftQuery("q95_rolling_distinct", Seq("EXT-approx", "EXT-olap"),
      "rolling 7-day distinct users from merged daily KMV sketches",
      q95RollingDistinct, Some(q95Sql)),
    GraftQuery("q144_join_size_estimate", Seq("EXT-approx", "A2"),
      "CMS inner-product join-cardinality estimate (optimizer statistic), soundness + bound flags",
      q144JoinSizeEstimate, Some(q144Sql)))
}
