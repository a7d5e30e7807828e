package graft.operators

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.pipeline.ParquetIO

/** Materialized suffix permutation — the [[ArtifactStore]] protocol
  * applied to q311's prefix-doubling construction (VERDICT r11 "What's
  * missing" #2 asked for a consumer layer over the ranks; a consumer
  * only makes sense if the permutation is built ONCE): through round
  * 11 q311 re-ran the full log(maxlen)-round doubling per invocation
  * (~7.6 s at sf0.1, the #2 bench query). A suffix array is the
  * canonical build-once structure — Lee et al.'s ExactSubstr pipeline
  * materializes it as THE artifact its dedup passes probe — so:
  *
  *  - `ranks` (rank, doc_id, pos) — the exact lexicographic rank of
  *    every suffix of the [[Dedup.SufMod]] document pool
  *    ([[Dedup.suffixRanksOf]], byte-order, (doc_id, pos) tie-break).
  *
  * Consumers: q311 (the construction's oracle-carried sample — its
  * DuckDB oracle proves the COMMITTED ranks equal brute-force
  * sorted-suffix truth on every gate run) and q315 (the LCP layer:
  * rank-adjacent shared-prefix lengths → variable-length duplicate
  * spans and the pool's longest repeated substring).
  *
  * Incremental growth ([[appendBuild]], round 13 — VERDICT r12 "What's
  * missing" #2): a single appended suffix shifts the GLOBAL rank of
  * everything lexicographically after it, so ranks do not compose
  * additively the way band rows or edge lists do — but they MERGE: a
  * suffix's final rank = 1 + the number of suffixes strictly below it,
  * and every below-count decomposes into window-order counts plus
  * window-collision comparisons. An exact global prefix-sum over the
  * merged distinct-window table ([[Dedup.SufBase]]-char windows, both
  * sides) resolves every comparison whose windows differ; only WINDOW
  * COLLISIONS (the duplicated-region mass, q315's survivor discipline)
  * extend char-exact against text — and the delta's own internal order
  * falls out of the same counting pass, so NO doubling round ever runs
  * on an append: history is scanned once for its windows, the delta
  * once for its windows and collisions.
  * [[q322SuffixMerge]] oracle-carries the merge algebra (merged
  * permutation ≡ brute-force sorted-suffix truth, q311's own oracle);
  * [[graft.SuffixIndexSpec]] proves append ≡ rebuild at the file level;
  * [[graft.SuffixAppendSmoke]] measures the O(delta)-rounds claim.
  */
object SuffixIndex extends ArtifactStore {

  /** Bump on ANY change to the ranking algebra the geometry knobs
    * below don't capture (sentinel semantics, tie-break, base window).
    */
  val AlgoVersion = 1

  protected def storeKind: String = "suffix"
  protected def geometry: String =
    s"g:$AlgoVersion,${Dedup.SufMod},${Dedup.SufBase}"
  protected def allTables: Seq[String] = Seq("ranks")

  protected def listing(dir: String): Seq[(String, String)] =
    tableListing(dir, "documents")

  protected def build(s: SparkSession, root: Path, snap: Seq[(String, String)]): Unit = {
    require(snap.nonEmpty, s"suffix index build: no documents files for $root")
    val docs = Dedup.suffixPoolDocs(
      s.read.parquet(snap.map(_._2): _*)
        .repartition(s.sparkContext.defaultParallelism)).persist()
    ParquetIO.overwriteSwap(Dedup.suffixRanksOf(s, docs),
      root.resolve("ranks").toString)
    writeSources(root, "ranks", snap.map(_._1).toSet)
    // breadcrumb for specs/smokes: overwriteSwap leaves no hard-link
    // evidence of which arm produced the current version
    writeAtomic(root, "_last_arm", "rebuild")
    docs.unpersist(false)
  }

  /** The merge arm: window prefix-sums + collision-only comparison
    * against the committed ranks (see object doc). Base text comes
    * from `snap` minus the new files — exactly the applied set, or the
    * torn state falls back to the rebuild.
    */
  protected def appendBuild(s: SparkSession, root: Path,
      newFiles: Seq[(String, String)], snap: Seq[(String, String)]): Boolean = {
    val applied = appliedSources(root, "ranks").getOrElse(return false)
    val subKeys = newFiles.filterNot(f => applied.contains(f._1)).map(_._1).toSet
    if (subKeys.isEmpty) return true
    val baseFiles = snap.filterNot(f => subKeys.contains(f._1))
    // the committed ranks must cover EXACTLY the base files (a sources
    // record that disagrees with the snapshot split means a torn or
    // foreign state — only the rebuild is safe)
    if (baseFiles.map(_._1).toSet != applied) return false
    val deltaDocs = Dedup.suffixPoolDocs(
      s.read.parquet(newFiles.filter(f => subKeys.contains(f._1)).map(_._2): _*))
      .persist()
    if (deltaDocs.isEmpty) {
      writeSources(root, "ranks", applied ++ subKeys)
      deltaDocs.unpersist(false)
      return true
    }
    val base = ParquetIO.read(s, root.resolve("ranks").toString)
    val baseDocs = Dedup.suffixPoolDocs(
      s.read.parquet(baseFiles.map(_._2): _*)
        .repartition(s.sparkContext.defaultParallelism)).persist()
    val merged = mergeRanks(s, base, baseDocs, deltaDocs)
    ParquetIO.overwriteSwap(merged, root.resolve("ranks").toString)
    writeSources(root, "ranks", applied ++ subKeys)
    writeAtomic(root, "_last_arm", "merge")
    deltaDocs.unpersist(false); baseDocs.unpersist(false)
    true
  }

  /** (doc_id, pos, g) — every suffix's [[Dedup.SufBase]]-char window. */
  private def windowsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")))).as("pos"), col("text"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(text, pos, ${Dedup.SufBase})").as("g"))

  /** One merge-comparison row: delta suffix (dd, dp) vs an OTHER suffix
    * (od, op) sharing a window — `isBase` says which side the other came
    * from; `oBelow` = the other sorts strictly below under (suffix
    * string, doc_id, pos) order.
    */
  final case class MergeCmp(
      dd: Long, dp: Long, od: Long, op: Long, isBase: Boolean, oBelow: Boolean)

  /** Merge a committed base permutation with a delta pool under the
    * global (suffix string, doc_id, pos) order — the artifact's own
    * tie-break — WITHOUT ranking the delta by doubling: a delta
    * suffix's final rank is 1 + (suffixes strictly below it on EITHER
    * side), and a base suffix's is its committed rank + (delta
    * suffixes below it). Window inequality resolves every comparison
    * but the collision mass via ONE exact global prefix-sum over the
    * merged distinct-window table; collisions (equal windows)
    * deep-compare char-exact from the verified [[Dedup.SufBase]]
    * offset — delta×base AND delta×delta collisions ride the same
    * comparison kernel, so the delta's own internal order falls out of
    * the same counting pass and no doubling round ever runs (the
    * doubling's per-round global ranks were the bulk of the first
    * cut's cost). Equal SHORT windows mean both suffixes are complete
    * and identical, so the compare loop never iterates and the
    * (doc, pos) tie-break decides — no special case.
    *
    * `base` must be (rank, doc_id, pos) with ranks dense over exactly
    * baseDocs' suffixes; the frame must NOT carry live [[GlobalRank]]
    * lineage (artifact reads and localCheckpoint'd frames are safe —
    * this method's own prefix-sum call evicts the one-slot range
    * cache).
    */
  private[operators] def mergeRanks(s: SparkSession,
      base: DataFrame, baseDocs: DataFrame, deltaDocs: DataFrame): DataFrame = {
    import s.implicits._
    val bSuf = base.join(windowsOf(baseDocs), Seq("doc_id", "pos"))
      .select($"rank".as("brank"), $"doc_id", $"pos", $"g").persist()
    val dSuf = windowsOf(deltaDocs).persist()
    // merged distinct-window table with per-side counts; the exact
    // running sums give, at each window g, the number of base / delta
    // suffixes whose window sorts strictly below g
    val allW = bSuf.groupBy($"g").agg(count(lit(1)).as("cb"))
      .join(dSuf.groupBy($"g").agg(count(lit(1)).as("cd")), Seq("g"), "full")
      .select($"g", coalesce($"cb", lit(0L)).as("cb"),
        coalesce($"cd", lit(0L)).as("cd"))
    val cum = GlobalRank.withGlobalPrefixSums(
        allW, Seq("cb" -> "cumb", "cd" -> "cumd"), $"g".asc)
      .select($"g", ($"cumb" - $"cb").as("blt"), ($"cumd" - $"cd").as("dlt"))
      .localCheckpoint()
    // window collisions: only these pairs touch text (q315's survivor
    // discipline — the duplicated-region mass). One kernel compares a
    // delta suffix against BOTH collision sides: the base rows supply
    // (other = base, textsource = baseDocs), the delta-self rows supply
    // (other = delta); the self-pair (same doc, pos) is excluded.
    val dTexts = deltaDocs.select($"doc_id".as("od"), $"text".as("to"),
      lit(false).as("isBase"))
    val others = bSuf.select($"g", $"doc_id".as("od"), $"pos".as("op"),
        lit(true).as("isBase"))
      .unionByName(dSuf.select($"g", $"doc_id".as("od"), $"pos".as("op"),
        lit(false).as("isBase")))
    val st = dSuf.select($"g", $"doc_id".as("dd"), $"pos".as("dp"))
      .join(others, Seq("g"))
      .filter($"isBase" || $"od" =!= $"dd" || $"op" =!= $"dp")
      .join(deltaDocs.select($"doc_id".as("dd"), $"text".as("td")), Seq("dd"))
      .join(baseDocs.select($"doc_id".as("od"), $"text".as("to"))
          .withColumn("isBase", lit(true))
          .unionByName(dTexts),
        Seq("od", "isBase"))
      .select($"dd", $"dp".cast("int").as("dp"), $"od",
        $"op".cast("int").as("op"), $"isBase", $"td", $"to")
      .as[(Long, Int, Long, Int, Boolean, String, String)]
    val cmp = st.mapPartitions(_.map { case (dd, dp, od, op, isBase, td, to) =>
      val ld = td.length - (dp - 1)
      val lo = to.length - (op - 1)
      val lim = math.min(ld, lo)
      var i = Dedup.SufBase
      while (i < lim && td.charAt(dp - 1 + i) == to.charAt(op - 1 + i)) i += 1
      val oBelow =
        if (i < lim) to.charAt(op - 1 + i) < td.charAt(dp - 1 + i)
        else if (lo != ld) lo < ld // shorter suffix is a proper prefix
        else od < dd || (od == dd && op < dp) // identical strings
      MergeCmp(dd, dp.toLong, od, op.toLong, isBase, oBelow)
    }).toDF().persist()
    // per delta suffix: collision-mass others strictly below it (both
    // sides); per base suffix: delta suffixes strictly ABOVE it are the
    // complements of its delta×base collision rows
    val n2 = cmp.filter($"oBelow")
      .groupBy($"dd".as("doc_id"), $"dp".as("pos")).agg(count(lit(1)).as("n2"))
    val m2 = cmp.filter($"isBase" && !$"oBelow")
      .groupBy($"od".as("doc_id"), $"op".as("pos")).agg(count(lit(1)).as("m2"))
    val fD = dSuf.join(cum, Seq("g"))
      .join(n2, Seq("doc_id", "pos"), "left")
      .select((lit(1L) + $"blt" + $"dlt" + coalesce($"n2", lit(0L))).as("rank"),
        $"doc_id", $"pos")
    val fB = bSuf.join(cum.select($"g", $"dlt"), Seq("g"))
      .join(m2, Seq("doc_id", "pos"), "left")
      .select(($"brank" + $"dlt" + coalesce($"m2", lit(0L))).as("rank"),
        $"doc_id", $"pos")
    fD.unionByName(fB)
  }

  /** (rank, doc_id, pos) — the committed suffix permutation. */
  def ranks(s: SparkSession, dir: String): DataFrame = {
    ensure(s, dir)
    ParquetIO.read(s, tableDir(dir, "ranks"))
  }

  // ---------------------------------------------------------------- q315

  /** q315 kernel row: one rank-adjacent suffix pair's exact LCP, doc
    * ids normalized unordered.
    */
  final case class LcpPair(doc_a: Long, doc_b: Long, lcp: Long)

  /** q315: SUFFIX-ARRAY LCP LAYER (Manber & Myers' lcp; the
    * distributed shape is the rank-adjacent self-join Kasai's identity
    * reduces to once ranks are materialized) — the consumer that turns
    * q311's permutation into the dedup family's full-generality
    * backbone: LCP[r] = |longest common prefix of the rank-r and
    * rank-(r−1) suffixes|, computed WITHOUT materializing a suffix.
    * Two stages: (1) every adjacent pair joins its [[Dedup.SufBase]]-
    * char windows (the construction's own base grams) — pairs whose
    * windows differ resolve there (LCP < 32, ordinary n-gram overlap,
    * q290's territory); (2) the survivors — exactly the duplicated-
    * region mass, a small fraction of n on any natural corpus — join
    * their two texts and extend char-exact. Output groups the ≥
    * [[Dedup.SufBase]] entries by unordered doc pair (n_adj, max_lcp,
    * sum_lcp): variable-length duplicate-span discovery at ARBITRARY
    * length — spans shorter than q290's 8-token anchor window or not
    * token-aligned are exactly what anchor grams miss ([[
    * graft.SuffixLcpSpec]] cross-checks the span sets) — and the
    * global max over rows is the pool's longest repeated substring
    * (the LRS is always attained at a rank-adjacent pair). At 100 TB:
    * one artifact read, two (doc,pos)-keyed window joins, a text join
    * on the SURVIVOR set only — never all-pairs, never a suffix
    * string. The oracle recomputes LCP from materialized suffixes via
    * the first single-char mismatch position (set-based, see q315Sql).
    */
  def q315SuffixLcp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rk = ranks(s, dir)
    val docs = Dedup.suffixPoolDocs(Tables.load(s, dir, "documents")).persist()
    val w32 = docs
      .select($"doc_id", explode(sequence(lit(1), length($"text"))).as("pos"),
        $"text")
      .select($"doc_id", $"pos",
        expr(s"substring(text, pos, ${Dedup.SufBase})").as("g"))
    val pairs = rk
      .select(($"rank" + 1).as("rank"), $"doc_id".as("doc_a"), $"pos".as("pos_a"))
      .join(rk.select($"rank", $"doc_id".as("doc_b"), $"pos".as("pos_b")), "rank")
    val surv = pairs
      .join(w32.select($"doc_id".as("doc_a"), $"pos".as("pos_a"), $"g".as("ga")),
        Seq("doc_a", "pos_a"))
      .join(w32.select($"doc_id".as("doc_b"), $"pos".as("pos_b"), $"g".as("gb")),
        Seq("doc_b", "pos_b"))
      .filter($"ga" === $"gb" && length($"ga") === Dedup.SufBase)
      .select($"doc_a", $"pos_a".cast("int").as("pos_a"),
        $"doc_b", $"pos_b".cast("int").as("pos_b"))
    val st = surv
      .join(docs.select($"doc_id".as("doc_a"), $"text".as("ta")), Seq("doc_a"))
      .join(docs.select($"doc_id".as("doc_b"), $"text".as("tb")), Seq("doc_b"))
      .select($"doc_a", $"pos_a", $"doc_b", $"pos_b", $"ta", $"tb")
      .as[(Long, Int, Long, Int, String, String)]
    // per-pair char-exact extension — the per-element scalar loop the
    // mapPartitions family exists for (both windows already matched to
    // SufBase, so the loop starts at a verified offset)
    val lcp = st.mapPartitions(_.map { case (da, pa, db, pb, ta, tb) =>
      val la = ta.length - (pa - 1)
      val lb = tb.length - (pb - 1)
      val lim = math.min(la, lb)
      var i = Dedup.SufBase
      while (i < lim && ta.charAt(pa - 1 + i) == tb.charAt(pb - 1 + i)) i += 1
      LcpPair(math.min(da, db), math.max(da, db), math.min(i, lim).toLong)
    }).toDF()
    lcp.groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_adj"), max($"lcp").as("max_lcp"),
        sum($"lcp").as("sum_lcp"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Exact LCP of materialized adjacent suffixes, set-based: explode
    * positions, keep single-char mismatches, min mismatch position − 1
    * is the LCP (no mismatch = the shorter suffix is a prefix of the
    * longer). A chained-CASE binary ladder was the first cut and hung:
    * DuckDB substitutes lateral column aliases textually at bind time,
    * so a 10-step ladder whose every step references the previous one
    * 4× expands to 4^10 substr calls per row. The mismatch-explode form
    * is one O(Σ min-suffix-len) scan — linear, vectorized.
    */
  private def q315Sql: String =
    s"""WITH s AS (
      |  SELECT doc_id, i AS pos, substring(text, i) AS suf
      |  FROM documents, unnest(generate_series(1, len(text))) AS t(i)
      |  WHERE doc_id % ${Dedup.SufMod} = 0),
      |r AS (
      |  SELECT doc_id, pos, suf,
      |    row_number() OVER (ORDER BY suf, doc_id, pos) AS rank
      |  FROM s),
      |l AS (
      |  SELECT a.rank AS pid, a.doc_id AS da, b.doc_id AS db,
      |    least(len(a.suf), len(b.suf)) AS ml, a.suf AS sa, b.suf AS sb
      |  FROM r a JOIN r b ON b.rank = a.rank + 1),
      |mism AS (
      |  SELECT pid, CAST(min(p) - 1 AS BIGINT) AS lcp
      |  FROM l, unnest(generate_series(1, ml)) g(p)
      |  WHERE substr(sa, CAST(p AS INT), 1) <> substr(sb, CAST(p AS INT), 1)
      |  GROUP BY pid),
      |lc AS (
      |  SELECT l.da, l.db, coalesce(m.lcp, CAST(l.ml AS BIGINT)) AS lcp
      |  FROM l LEFT JOIN mism m USING (pid))
      |SELECT least(da, db) AS doc_a, greatest(da, db) AS doc_b,
      |  CAST(count(*) AS BIGINT) AS n_adj,
      |  CAST(max(lcp) AS BIGINT) AS max_lcp,
      |  CAST(sum(lcp) AS BIGINT) AS sum_lcp
      |FROM lc
      |WHERE lcp >= ${Dedup.SufBase}
      |GROUP BY 1, 2
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q322

  /** q322: SUFFIX-ARRAY MERGE — the merge ALGEBRA of the incremental
    * [[appendBuild]] arm, oracle-carried on the q314/q302 pattern: the
    * pool splits on doc_id % 100 = 70 (today's batch — 10% of the
    * [[Dedup.SufMod]] pool), the BASE permutation comes from the
    * committed artifact (filtered to base docs and densified
    * order-preservingly — relative order among base suffixes is
    * delta-independent, so this is exactly the committed base-world
    * array, never a re-run of the doubling), the DELTA is merged
    * in-query, and [[mergeRanks]] composes final ranks by cross-side
    * merge-counting (doubling-free — see the method doc). The oracle is q311's brute-force sorted-suffix
    * truth over the WHOLE pool — hash equality IS the merge ≡ rebuild
    * theorem that makes the artifact's O(delta) arm safe to trust at
    * production cadence. Output is q311's sample shape, so a single
    * mis-counted cross-side suffix anywhere in the permutation shifts
    * a sampled rank and breaks the gate.
    */
  def q322SuffixMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pool = Dedup.suffixPoolDocs(Tables.load(s, dir, "documents")).persist()
    val baseDocs = pool.filter($"doc_id" % 100 =!= 70)
    val deltaDocs = pool.filter($"doc_id" % 100 === 70)
    val base = GlobalRank.withGlobalRank(
        ranks(s, dir).filter($"doc_id" % 100 =!= 70), "brank", $"rank".asc)
      .select($"brank".as("rank"), $"doc_id", $"pos")
      .localCheckpoint()
    val merged = mergeRanks(s, base, baseDocs, deltaDocs)
    merged.filter($"rank" <= 30 || $"rank" % 2500 === 1)
      .join(pool, Seq("doc_id"))
      .select($"rank", $"doc_id", $"pos",
        expr("substring(text, pos, 40)").as("head40"))
      .orderBy($"rank")
  }

  // ---------------------------------------------------------------- q323

  /** q323 removal threshold, in CHARS: the shortest repeat the LCP trim
    * removes. 15 = the minimum char length of an 8-token anchor span on
    * a single-spaced corpus (8 tokens of ≥1 char + 7 joining spaces),
    * which is what makes the containment theorem below hold: every
    * position the pool-world anchor-gram trim removes is inside some
    * shared span of char length ≥ 15.
    */
  val LcpTrimMinSpan = 15

  /** q323: LCP-DRIVEN VARIABLE-LENGTH TRIM — the removal-algebra
    * consumer of q315 (VERDICT r12 "Next round" #5): anchor-gram
    * ExactSubstr (q290/q304) can only see repeats ≥ 8 whole tokens; the
    * suffix structure sees EVERY repeat. A pool position p is removed
    * iff some other pool suffix shares ≥ [[LcpTrimMinSpan]] chars of
    * prefix with the suffix at p — equivalently max(adjacent-rank LCP
    * up, down) ≥ the threshold, since all suffixes ranked between two
    * suffixes share at least their pairwise LCP — and the removal RANGE
    * [p, p + maxadj − 1] extends to the full shared extent, so span
    * tails whose remaining overlap is short still fall (both copies of
    * a duplicated region are trimmed — the char-level policy; the
    * token-level b-side policy stays q304's). Adjacent LCPs come from
    * the committed permutation: pairs whose 32-char windows differ
    * resolve from the windows alone (a codegen'd zip_with mismatch
    * scan, no text), equal-full-window survivors extend char-exact
    * (q315's discipline). The ANCHOR arm runs the pool-world
    * ExactSubstr over the committed [[TrimIndex.gramsPostings]]
    * artifact filtered to pool docs, maps its b-side token cover to
    * char positions, and the output's `anchor_only` column counts
    * anchor-removed chars the LCP cover misses — the containment
    * theorem (expect 0 everywhere, asserted by [[graft.SuffixLcpSpec]];
    * the oracle recomputes the same statistic, so the hash locks it
    * cross-engine either way). `lcp_removed` strictly exceeding
    * `anchor_removed` in aggregate is the strictness half: sub-8-token
    * and non-token-aligned repeats only the suffix structure finds.
    */
  /** (doc_id, st, en) — the DISJOINT removal intervals of the LCP trim
    * over the given pool frame (per-doc interval union of the
    * [p, p + maxadj − 1] ranges, maxadj ≥ [[LcpTrimMinSpan]]) — the
    * machinery shared by q323 (accounting + containment theorem) and
    * q325 (the rewrite). Persisted; the caller's clearCache releases.
    */
  private def lcpCoverIntervals(
      s: SparkSession, dir: String, pool: DataFrame): DataFrame = {
    import s.implicits._
    val rk = ranks(s, dir)
    // attach each suffix's window ONCE, then one rank self-join (the
    // exchange is reused across both sides) instead of q315's
    // three-join shape
    val wrk = rk.join(windowsOf(pool), Seq("doc_id", "pos")).persist()
    val pairs = wrk
      .select(($"rank" + 1).as("rank"), $"doc_id".as("da"), $"pos".as("pa"),
        $"g".as("ga"))
      .join(wrk.select($"rank", $"doc_id".as("db"), $"pos".as("pb"),
        $"g".as("gb")), "rank")
      .persist()
    // window-resolved pairs: LCP = first mismatch across the two
    // ≤32-char windows (mm = 0 means no mismatch — the shorter window
    // is the whole shorter suffix and a prefix of the other)
    val winLcp = pairs
      .filter(!($"ga" === $"gb" && length($"ga") === Dedup.SufBase))
      .select($"rank",
        array_position(zip_with(split($"ga", ""), split($"gb", ""),
          (x, y) => coalesce(x === y, lit(false))), false).as("mm"),
        least(length($"ga"), length($"gb")).cast("long").as("ml"))
      .select($"rank", when($"mm" === 0, $"ml").otherwise($"mm" - 1).as("lcp"))
    // equal-full-window survivors: char-exact extension from offset 32
    val st = pairs.filter($"ga" === $"gb" && length($"ga") === Dedup.SufBase)
      .join(pool.select($"doc_id".as("da"), $"text".as("ta")), Seq("da"))
      .join(pool.select($"doc_id".as("db"), $"text".as("tb")), Seq("db"))
      .select($"rank", $"pa".cast("int").as("pa"), $"pb".cast("int").as("pb"),
        $"ta", $"tb")
      .as[(Long, Int, Int, String, String)]
    val extLcp = st.mapPartitions(_.map { case (r, pa, pb, ta, tb) =>
      val la = ta.length - (pa - 1)
      val lb = tb.length - (pb - 1)
      val lim = math.min(la, lb)
      var i = Dedup.SufBase
      while (i < lim && ta.charAt(pa - 1 + i) == tb.charAt(pb - 1 + i)) i += 1
      (r, math.min(i, lim).toLong)
    }).toDF("rank", "lcp")
    // per-suffix max over its two rank neighbors (pair key = HIGH rank:
    // suffix r is the high member of pair r, the low member of pair r+1);
    // persisted — it feeds both neighbor directions
    val lcpAll = winLcp.unionByName(extLcp).persist()
    val maxadj = lcpAll
      .unionByName(lcpAll.select(($"rank" - 1).as("rank"), $"lcp"))
      .groupBy($"rank").agg(max($"lcp").as("madj"))
      .filter($"madj" >= LcpTrimMinSpan)
    // removal ranges as INTERVALS, unioned per doc (sort by start, a
    // running max of prior ends starts a new group at every gap) — a
    // duplicated region of length L would otherwise explode ~L²/2
    // cover positions (every interior suffix re-lists its tail), and
    // the interval union is exact for both the count and the
    // membership tests below. The window is doc-partitioned — never a
    // global sort.
    val wd = Window.partitionBy($"doc_id").orderBy($"st", $"en")
    rk.join(maxadj, Seq("rank"))
      .select($"doc_id", $"pos".cast("long").as("st"),
        ($"pos".cast("long") + $"madj" - 1).as("en"))
      .withColumn("pmax",
        max($"en").over(wd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("grp", sum(when($"pmax".isNull || $"st" > $"pmax", 1)
        .otherwise(0)).over(wd))
      .groupBy($"doc_id", $"grp").agg(min($"st").as("st"), max($"en").as("en"))
      .persist()
  }

  def q323LcpTrim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pool = Dedup.suffixPoolDocs(Tables.load(s, dir, "documents")).persist()
    val coverIv = lcpCoverIntervals(s, dir, pool)
    // anchor arm: pool-world ExactSubstr from the committed gram
    // postings, b-side token cover mapped to char positions
    val gramsPool = TrimIndex.gramsPostings(s, dir)
      .filter($"doc_id" % Dedup.SufMod === 0)
    val keep = gramsPool.groupBy($"g")
      .agg(count_distinct($"doc_id").as("nd"))
      .filter($"nd" >= 2 && $"nd" <= Dedup.ExactSubstrDfCap).select($"g")
    val bcov = Dedup.exactSubstrBCover(Dedup.exactSubstrSpansFromPostings(
      gramsPool.join(broadcast(keep), "g")))
    val toks = pool.select($"doc_id", split($"text", " ").as("t"))
    val anchorChars = bcov.join(toks, Seq("doc_id"))
      .select($"doc_id",
        (length(array_join(slice($"t", lit(1), ($"pos" - 1).cast("int")), " ")) +
          when($"pos" === 1, 1).otherwise(2)).cast("long").as("cstart"),
        length(element_at($"t", $"pos".cast("int"))).cast("long").as("tlen"))
      .filter($"tlen" > 0)
      .select($"doc_id",
        explode(sequence($"cstart", $"cstart" + $"tlen" - 1)).as("cpos"))
      .distinct()
      .persist()
    val lcpCnt = coverIv.groupBy($"doc_id")
      .agg(sum($"en" - $"st" + 1).as("lcp_removed"))
    val ancCnt = anchorChars.groupBy($"doc_id")
      .agg(count(lit(1)).as("anchor_removed"))
    // containment test by interval membership: doc-equi join + range
    // predicate (per-doc intervals are few after the union)
    val missCnt = anchorChars
      .join(coverIv.select($"doc_id".as("did"), $"st", $"en"),
        $"doc_id" === $"did" && $"cpos".between($"st", $"en"), "left_anti")
      .groupBy($"doc_id").agg(count(lit(1)).as("anchor_only"))
    pool.select($"doc_id", length($"text").cast("long").as("n_chars"))
      .join(lcpCnt, Seq("doc_id"), "left")
      .join(ancCnt, Seq("doc_id"), "left")
      .join(missCnt, Seq("doc_id"), "left")
      .select($"doc_id", $"n_chars",
        coalesce($"lcp_removed", lit(0L)).as("lcp_removed"),
        coalesce($"anchor_removed", lit(0L)).as("anchor_removed"),
        coalesce($"anchor_only", lit(0L)).as("anchor_only"))
      .orderBy($"doc_id")
  }

  /** The oracle recomputes both covers set-based: adjacent LCPs from
    * materialized suffixes via the single-char mismatch explode (the
    * q315 form — MATERIALIZED levels, never a chained-alias ladder),
    * range expansion via generate_series, and the anchor arm as the
    * pool-filtered ExactSubstr CTE chain with the identical
    * token→char-offset mapping.
    */
  /** The adjacent-LCP → maxadj → position-cover chain plus the pool
    * frame — the oracle prefix shared by q323 and q325 (the cover is
    * position-form here; the engines' interval form counts and tests
    * identically).
    */
  private def lcpCoverCtes: String =
    s"""sfx AS (
      |  SELECT doc_id, i AS pos, substring(text, i) AS suf
      |  FROM documents, unnest(generate_series(1, len(text))) AS u(i)
      |  WHERE doc_id % ${Dedup.SufMod} = 0),
      |r AS MATERIALIZED (
      |  SELECT doc_id, pos, suf,
      |    row_number() OVER (ORDER BY suf, doc_id, pos) AS rank
      |  FROM sfx),
      |l AS MATERIALIZED (
      |  SELECT a.rank AS pid, least(len(a.suf), len(b.suf)) AS ml,
      |    a.suf AS sa, b.suf AS sb
      |  FROM r a JOIN r b ON b.rank = a.rank + 1),
      |mism AS (
      |  SELECT pid, CAST(min(p) - 1 AS BIGINT) AS lcp
      |  FROM l, unnest(generate_series(1, ml)) g(p)
      |  WHERE substr(sa, CAST(p AS INT), 1) <> substr(sb, CAST(p AS INT), 1)
      |  GROUP BY pid),
      |lc AS MATERIALIZED (
      |  SELECT l.pid, coalesce(m.lcp, CAST(l.ml AS BIGINT)) AS lcp
      |  FROM l LEFT JOIN mism m USING (pid)),
      |madj AS MATERIALIZED (
      |  SELECT rank, max(lcp) AS madj FROM (
      |    SELECT pid AS rank, lcp FROM lc
      |    UNION ALL SELECT pid + 1 AS rank, lcp FROM lc) u
      |  GROUP BY rank HAVING max(lcp) >= $LcpTrimMinSpan),
      |cover AS MATERIALIZED (
      |  SELECT DISTINCT r.doc_id, CAST(r.pos + q.k AS BIGINT) AS cpos
      |  FROM r JOIN madj USING (rank),
      |    unnest(generate_series(0, madj - 1)) q(k)),
      |pool AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE doc_id % ${Dedup.SufMod} = 0 AND len(text) >= 1)""".stripMargin

  private def q323Sql: String =
    s"""WITH ${Dedup.exactSubstrCtesPool},
      |$lcpCoverCtes,
      |bcov AS MATERIALIZED (
      |  SELECT DISTINCT doc_b AS doc_id, b_start + q.k AS pos
      |  FROM spans, unnest(generate_series(0, span_len - 1)) q(k)),
      |ach AS MATERIALIZED (
      |  SELECT DISTINCT x.doc_id, CAST(x.cs + q.k AS BIGINT) AS cpos
      |  FROM (SELECT b.doc_id, b.pos,
      |          len(array_to_string(
      |            list_slice(t.t, 1, CAST(b.pos - 1 AS INT)), ' ')) +
      |            CASE WHEN b.pos = 1 THEN 1 ELSE 2 END AS cs,
      |          len(t.t[CAST(b.pos AS INT)]) AS tl
      |        FROM bcov b JOIN toks t USING (doc_id)) x,
      |    unnest(generate_series(0, x.tl - 1)) q(k)
      |  WHERE x.tl > 0)
      |SELECT p.doc_id, CAST(len(p.text) AS BIGINT) AS n_chars,
      |  coalesce(lcnt.c, 0) AS lcp_removed,
      |  coalesce(acnt.c, 0) AS anchor_removed,
      |  coalesce(mcnt.c, 0) AS anchor_only
      |FROM pool p
      |LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
      |           FROM cover GROUP BY 1) lcnt USING (doc_id)
      |LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
      |           FROM ach GROUP BY 1) acnt USING (doc_id)
      |LEFT JOIN (SELECT a.doc_id, CAST(count(*) AS BIGINT) AS c
      |           FROM ach a LEFT JOIN cover c
      |             ON a.doc_id = c.doc_id AND a.cpos = c.cpos
      |           WHERE c.doc_id IS NULL GROUP BY 1) mcnt USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

  // ---------------------------------------------------------------- q325

  /** q325: LCP TRIM REWRITE — the consumer half of q323 (what q304 is
    * to q290): every char position inside the LCP removal intervals is
    * dropped and the cleaned pool corpus re-assembles from the
    * survivors. Output is one row per pool document — original /
    * removed / kept char counts (removed + kept = n_chars is a column
    * identity the hash enforces) plus an md5 of the re-joined kept
    * text, so a single resurrected or mis-dropped CHARACTER anywhere in
    * the pool breaks the gate. This is the char-level analogue of
    * q304's token rewrite: both copies of a duplicated region fall
    * (the q323 policy), which is the conservative dedup a contamination
    * scrub wants, vs q304's keep-first-occurrence. Plumbing: the
    * interval set is doc-keyed and disjoint, membership is one
    * doc-equi + range anti-join, and the kept-text hash is the q304
    * collect_list(struct(pos, ch)) → array_sort → md5 device — every
    * stage keyed on doc_id, nothing pairwise.
    */
  def q325LcpRewrite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pool = Dedup.suffixPoolDocs(Tables.load(s, dir, "documents")).persist()
    val cov = lcpCoverIntervals(s, dir, pool)
    val chars = pool
      .select($"doc_id",
        explode(sequence(lit(1L), length($"text").cast("long"))).as("cpos"),
        $"text")
      .select($"doc_id", $"cpos",
        expr("substring(text, CAST(cpos AS INT), 1)").as("ch"))
    val kept = chars
      .join(cov.select($"doc_id".as("did"), $"st", $"en"),
        $"doc_id" === $"did" && $"cpos".between($"st", $"en"), "left_anti")
    val keptAgg = kept.groupBy($"doc_id")
      .agg(count(lit(1)).as("kept_chars"),
        md5(array_join(
          transform(array_sort(collect_list(struct($"cpos", $"ch"))),
            x => x.getField("ch")), "")).as("kept_hash"))
    val remCnt = cov.groupBy($"doc_id")
      .agg(sum($"en" - $"st" + 1).as("removed_chars"))
    pool.select($"doc_id", length($"text").cast("long").as("n_chars"))
      .join(remCnt, Seq("doc_id"), "left")
      .join(keptAgg, Seq("doc_id"), "left")
      .select($"doc_id", $"n_chars",
        coalesce($"removed_chars", lit(0L)).as("removed_chars"),
        coalesce($"kept_chars", lit(0L)).as("kept_chars"),
        coalesce($"kept_hash", md5(lit(""))).as("kept_hash"))
      .orderBy($"doc_id")
  }

  private def q325Sql: String =
    s"""WITH $lcpCoverCtes,
      |chars AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS cpos,
      |    substr(text, CAST(i AS INT), 1) AS ch
      |  FROM pool, unnest(generate_series(1, len(text))) AS u(i)),
      |kept AS MATERIALIZED (
      |  SELECT c.doc_id, c.cpos, c.ch
      |  FROM chars c LEFT JOIN cover v
      |    ON v.doc_id = c.doc_id AND v.cpos = c.cpos
      |  WHERE v.doc_id IS NULL)
      |SELECT p.doc_id, CAST(len(p.text) AS BIGINT) AS n_chars,
      |  coalesce(rc.c, 0) AS removed_chars,
      |  coalesce(ka.c, 0) AS kept_chars,
      |  coalesce(ka.h, md5('')) AS kept_hash
      |FROM pool p
      |LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
      |           FROM cover GROUP BY 1) rc USING (doc_id)
      |LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS c,
      |             md5(string_agg(ch, '' ORDER BY cpos)) AS h
      |           FROM kept GROUP BY 1) ka USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q325_lcp_rewrite", Seq("EXT-dedup", "EXT-text"),
      "LCP trim rewrite: the cleaned pool corpus re-assembled from surviving char positions, kept-text md5 per doc locking the exact rewrite",
      q325LcpRewrite, Some(q325Sql)),
    GraftQuery("q315_suffix_lcp", Seq("EXT-dedup", "EXT-text"),
      "suffix-array LCP layer: rank-adjacent window join + survivor-only char extension over the persisted permutation; variable-length duplicate spans + longest repeated substring",
      q315SuffixLcp, Some(q315Sql)),
    GraftQuery("q322_suffix_merge", Seq("EXT-dedup", "S6"),
      "incremental suffix-array maintenance: committed base permutation merged with the delta by window prefix-sums and collision-only char extension (doubling-free), proven equal to full-pool sorted-suffix truth",
      q322SuffixMerge, Some(Dedup.q311SqlShared)),
    GraftQuery("q323_lcp_trim", Seq("EXT-dedup", "EXT-text"),
      "LCP-driven variable-length char trim over the persisted permutation, with per-doc accounting proving it contains the pool-world anchor-gram removal set",
      q323LcpTrim, Some(q323Sql)))
}
