package graft.operators

import java.nio.file.Path

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *    ([[Dedup.suffixRanksOf]], byte-order, (doc_id, pos) tie-break);
  *  - `cover` (doc_id, st, en) — the DISJOINT char-interval removal
  *    cover of the LCP trim (round 14, VERDICT r13 "What's missing"
  *    #2: q323 and q325 each re-derived this per invocation — the
  *    identical pairs → window-LCP → survivor-extension → maxadj →
  *    interval-union chain ran twice per bench pass; it is a pure
  *    function of the committed ranks + pool bytes, exactly the
  *    artifact shape [[MlIndex]] gave q307/q320).
  *
  * Consumers: q311 (the construction's oracle-carried sample — its
  * DuckDB oracle proves the COMMITTED ranks equal brute-force
  * sorted-suffix truth on every gate run), q315 (the LCP layer),
  * q323/q325 (the trim accounting and rewrite, both reading `cover`),
  * and q327 (the streaming maintenance loop).
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
  * extend further — and the delta's own internal order falls out of
  * the same counting pass, so NO doubling round ever runs over the
  * history: it is scanned once for its windows, the delta once for its
  * windows and collisions.
  *
  * Collision bounding (round 14, VERDICT r13 "What's wrong" #1): the
  * first cut compared EVERY delta suffix against EVERY same-window
  * suffix char-exact — quadratic in window multiplicity, and
  * boilerplate-heavy corpora (license headers, templated docs) are
  * precisely what a dedup pipeline ingests. Now a collision group past
  * [[MergeCollisionCap]] members RE-WINDOWS instead: per round the
  * group's members extract the next chunk of doubling length
  * ([32,64), [64,128), …) and one per-group window over the DISTINCT
  * chunks resolves every cross-chunk comparison by counting — the
  * k-copies-of-one-boilerplate group aggregates to ONE distinct-chunk
  * row per round, so its cost is k·log(maxlen) rows of bookkeeping,
  * never k² comparisons ([[graft.SuffixSkewSmoke]] measures the
  * growth). Only groups within the cap (or the identical-suffix
  * terminal sets' tie-breaks) ever materialize pairwise rows.
  *
  * The cover composes incrementally too: removal intervals are
  * MONOTONE under pool growth — an inserted suffix d between old
  * neighbors a, b satisfies lcp(a,d) ≥ lcp(a,b) and lcp(d,b) ≥
  * lcp(a,b) (d shares at least the pair's common prefix), so every
  * committed interval stays valid and the only NEW intervals come from
  * merged-adjacent pairs touching a delta suffix — O(delta) pairs,
  * each compared char-exact once, unioned with the old intervals
  * ([[coverDeltaIntervals]]).
  *
  * [[q322SuffixMerge]] oracle-carries the merge algebra (merged
  * permutation ≡ brute-force sorted-suffix truth, q311's own oracle);
  * [[graft.SuffixIndexSpec]] proves append ≡ rebuild at the file level
  * for BOTH tables; [[graft.SuffixAppendSmoke]] measures the
  * O(delta)-rounds claim; [[graft.SuffixSkewSmoke]] the multiplicity
  * bound.
  */
object SuffixIndex extends ArtifactStore {

  /** Bump on ANY change to the ranking algebra the geometry knobs
    * below don't capture (sentinel semantics, tie-break, base window).
    */
  val AlgoVersion = 1

  /** Max same-prefix collision-group multiplicity the pairwise
    * comparison kernel accepts; groups past it re-window by doubling
    * chunks (see object doc). Pure execution-path knob — it never
    * changes the committed ranks, so it is NOT part of `geometry`.
    */
  val MergeCollisionCap = 32

  /** Diagnostics for smokes/specs: pairwise-kernel comparison rows and
    * extension rounds of the most recent [[mergeRanks]] run.
    */
  @volatile private[graft] var lastMergeKernelRows: Long = -1L
  @volatile private[graft] var lastMergeRounds: Int = -1

  protected def storeKind: String = "suffix"
  protected def geometry: String =
    s"g:$AlgoVersion,${Dedup.SufMod},${Dedup.SufBase},t:$LcpTrimMinSpan"
  protected def allTables: Seq[String] = Seq("ranks", "cover")

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
    ParquetIO.overwriteSwap(
      coverFromRanks(s, ParquetIO.read(s, root.resolve("ranks").toString), docs),
      root.resolve("cover").toString)
    writeSources(root, "cover", snap.map(_._1).toSet)
    // breadcrumb for specs/smokes: overwriteSwap leaves no hard-link
    // evidence of which arm produced the current version
    writeAtomic(root, "_last_arm", "rebuild")
    docs.unpersist(false)
  }

  /** The merge arm: window prefix-sums + bounded collision resolution
    * against the committed ranks, then the O(delta)-pairs cover union
    * (see object doc). Base text comes from `snap` minus the new files
    * — exactly the applied set, or the torn state falls back to the
    * rebuild.
    */
  protected def appendBuild(s: SparkSession, root: Path,
      newFiles: Seq[(String, String)], snap: Seq[(String, String)]): Boolean = {
    val applied = appliedSources(root, "ranks").getOrElse(return false)
    // a crash between the ranks and cover commits leaves the records
    // divergent — the delta math below assumes both tables describe the
    // same base world, so only the rebuild is safe
    if (!appliedSources(root, "cover").contains(applied)) return false
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
      writeSources(root, "cover", applied ++ subKeys)
      // ADVICE r13: without this a no-op append leaves the breadcrumb
      // reporting whichever arm ran previously
      writeAtomic(root, "_last_arm", "noop")
      deltaDocs.unpersist(false)
      return true
    }
    val base = ParquetIO.read(s, root.resolve("ranks").toString)
    val oldCover = ParquetIO.read(s, root.resolve("cover").toString)
      .localCheckpoint() // survives the ranks overwriteSwap below
    val baseDocs = Dedup.suffixPoolDocs(
      s.read.parquet(baseFiles.map(_._2): _*)
        .repartition(s.sparkContext.defaultParallelism)).persist()
    val merged = mergeRanks(s, base, baseDocs, deltaDocs)
    ParquetIO.overwriteSwap(merged, root.resolve("ranks").toString)
    writeSources(root, "ranks", applied ++ subKeys)
    val newIv = coverDeltaIntervals(s, merged, baseDocs, deltaDocs)
    ParquetIO.overwriteSwap(unionIntervals(oldCover.unionByName(newIv)),
      root.resolve("cover").toString)
    writeSources(root, "cover", applied ++ subKeys)
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
    * (od, op) sharing a verified prefix of `so` chars — `isBase` says
    * which side the other came from; `oBelow` = the other sorts
    * strictly below under (suffix string, doc_id, pos) order.
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
    * merged distinct-window table; collisions resolve by BOUNDED
    * rounds:
    *
    *  - a collision group within [[MergeCollisionCap]] members goes to
    *    the pairwise char kernel (compare from the verified offset;
    *    ties by code POINT, not UTF-16 unit — ADVICE r13: charAt order
    *    diverges from the UTF-8 byte order every other sort in the
    *    family uses once supplementary-plane text meets U+E000–U+FFFF,
    *    and the wrong permutation would commit to the artifact);
    *  - a group past the cap extracts its next doubling-length chunk
    *    and ONE per-group window over the DISTINCT chunks counts every
    *    cross-chunk comparison (the k-duplicate boilerplate group is
    *    one distinct-chunk row — k·log rows total, never k²); equal
    *    full-length chunks re-group and repeat, equal short chunks
    *    mean the suffixes ENDED identical and only the (doc_id, pos)
    *    tie-break — a per-group row_number — orders them.
    *
    * Delta×base AND delta×delta collisions ride the same machinery, so
    * the delta's own internal order falls out of the same counting
    * pass and no doubling round ever runs over the history.
    *
    * `base` must be (rank, doc_id, pos) with ranks dense over exactly
    * baseDocs' suffixes; the frame must NOT carry live [[GlobalRank]]
    * lineage (artifact reads and localCheckpoint'd frames are safe —
    * this method's own prefix-sum call evicts the one-slot range
    * cache). With `eager` (the ensure() path) the returned frame is
    * localCheckpoint-materialized and every intermediate unpersisted
    * before return (ADVICE r13 — mergeRanks runs inside ensure()
    * during an arbitrary query, so a leaked cache would outlive the
    * build); q322's in-query call passes eager=false and leaves its
    * caches to the session's ordinary clearCache discipline, skipping
    * a full-permutation re-serialization its one consumer never needs.
    */
  private[operators] def mergeRanks(s: SparkSession,
      base: DataFrame, baseDocs: DataFrame, deltaDocs: DataFrame,
      eager: Boolean = true): DataFrame = {
    import s.implicits._
    val toFree = ListBuffer.empty[DataFrame]
    def pinned(df: DataFrame): DataFrame = { toFree += df.persist(); df }
    val bSuf = pinned(base.join(windowsOf(baseDocs), Seq("doc_id", "pos"))
      .select($"rank".as("brank"), $"doc_id", $"pos", $"g"))
    val dSuf = pinned(windowsOf(deltaDocs))
    // merged distinct-window table with per-side counts; the exact
    // running sums give, at each window g, the number of base / delta
    // suffixes whose window sorts strictly below g
    // pinned: both the global prefix-sum and the round-0 collision
    // classification read it
    val allW = pinned(bSuf.groupBy($"g").agg(count(lit(1)).as("cb"))
      .join(dSuf.groupBy($"g").agg(count(lit(1)).as("cd")), Seq("g"), "full")
      .select($"g", coalesce($"cb", lit(0L)).as("cb"),
        coalesce($"cd", lit(0L)).as("cd")))
    val cum = GlobalRank.withGlobalPrefixSums(
        allW, Seq("cb" -> "cumb", "cd" -> "cumd"), $"g".asc)
      .select($"g", ($"cumb" - $"cb").as("blt"), ($"cumd" - $"cd").as("dlt"))
      .localCheckpoint()
    val texts = pinned(
      baseDocs.select($"doc_id", $"text", lit(true).as("isBase"))
        .unionByName(deltaDocs.select($"doc_id", $"text", lit(false).as("isBase"))))

    // ---- bounded collision resolution (see scaladoc) ----
    val n2Parts = ListBuffer.empty[DataFrame]
    val m2Parts = ListBuffer.empty[DataFrame]
    val kernParts = ListBuffer.empty[DataFrame]
    def contrib(df: DataFrame, add: Column): DataFrame =
      df.select($"doc_id", $"pos".cast("long").as("pos"), add.as("add"))
    // One round's routing: members (key, c, isBase, doc_id, pos, cls)
    // where all of a key's members share a verified prefix, c is this
    // round's chunk (length ≤ len) and cls is the subgroup's class.
    // Appends terminal tie-breaks and within-cap kernel pairs to the
    // buffers; returns the groups that must extend again (equal
    // full-length chunks past the cap).
    def route(cm: DataFrame, startOff: Int): DataFrame = {
      // terminal: every member's suffix ended at the same length, so
      // the strings are IDENTICAL and only the (doc_id, pos) tie-break
      // orders them — per-group running counts, no pairwise rows even
      // for a thousand-copy group
      val wtx = Window.partitionBy($"key", $"c").orderBy($"doc_id", $"pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tRes = cm.filter($"cls" === "term")
        .withColumn("below", count(lit(1)).over(wtx))
        .withColumn("dbelow", coalesce(
          sum(when($"isBase", 0L).otherwise(1L)).over(wtx), lit(0L)))
      n2Parts += contrib(tRes.filter(!$"isBase" && $"below" > 0), $"below")
      m2Parts += contrib(tRes.filter($"isBase" && $"dbelow" > 0), $"dbelow")
      // within-cap groups: delta × others pairwise, compared char-exact
      // from the startOff chars the group is known to share
      val kern = cm.filter($"cls" === "kern")
      kernParts += kern.filter(!$"isBase")
        .select($"key", $"c", $"doc_id".as("dd"), $"pos".as("dp"))
        .join(kern.select($"key", $"c", $"doc_id".as("od"), $"pos".as("op"),
          $"isBase"), Seq("key", "c"))
        .filter($"isBase" || $"od" =!= $"dd" || $"op" =!= $"dp")
        .select($"dd", $"dp", $"od", $"op", $"isBase", lit(startOff).as("so"))
      cm.filter($"cls" === "cont")
    }
    def classOf(nt: Column, ndel: Column, cl: Column, len: Int): Column =
      when(ndel === 0 || nt === 1, "drop")
        .when(cl < len, "term")
        .when(nt <= MergeCollisionCap, "kern")
        .otherwise("cont")

    // round 0: the equal-window classes. Cross-window order is already
    // counted by the global prefix-sum above, and the per-window stats
    // already exist in allW — so routing is one join of the suffixes
    // against the (small) delta-present window classes, never a
    // re-aggregation of the full window population.
    // cls0 is the DISTINCT delta-present collision-window classes —
    // tiny next to the suffix population (boilerplate dedups to few
    // windows), so it is the side to pin: route() fans the member join
    // out to four consumers (terminal counts ×2, kernel pairs, the
    // continuing set), and each re-runs only a cached-scan + small-side
    // hash join, never a member-population shuffle or cache write
    val cls0 = pinned(allW.filter($"cd" >= 1 && ($"cb" + $"cd") >= 2)
      .select($"g",
        classOf($"cb" + $"cd", $"cd", length($"g"), Dedup.SufBase).as("cls"))
      .filter($"cls" =!= "drop"))
    val mem0 = bSuf.select($"g", lit(true).as("isBase"), $"doc_id", $"pos")
      .unionByName(dSuf.select($"g", lit(false).as("isBase"),
        $"doc_id", $"pos"))
      .join(cls0, Seq("g"))
      .select(lit("").as("key"), $"g".as("c"), $"isBase", $"doc_id", $"pos",
        $"cls")
    val cont0 = route(mem0, Dedup.SufBase)
    // on a natural (non-boilerplate-skewed) corpus NO group passes the
    // cap — probe the tiny class table before paying a checkpoint pass
    // over the member population for an empty continuation set
    var live =
      if (cls0.filter($"cls" === "cont").isEmpty) s.emptyDataFrame
      else cont0
        .select(concat($"key", $"c").as("key"), $"isBase", $"doc_id", $"pos")
        .localCheckpoint()
    var off = Dedup.SufBase // chars every live group's members share
    var rounds = 0
    while (live.count() > 0) {
      rounds += 1
      val len = off // doubling: chunk [off, 2·off)
      val withChunk = live.join(texts, Seq("doc_id", "isBase"))
        .withColumn("c", expr(s"substring(text, pos + $off, $len)"))
        .drop("text")
      // cross-chunk order within each group: running per-side counts
      // over the DISTINCT chunks (a window per group key, sorted by
      // Spark's UTF-8 binary order — the same order the global
      // prefix-sum and the committed permutation use)
      val wk = Window.partitionBy($"key").orderBy($"c")
        .rowsBetween(Window.unboundedPreceding, -1)
      val grpC = withChunk.groupBy($"key", $"c")
        .agg(sum(when($"isBase", 1L).otherwise(0L)).as("cb"),
          sum(when($"isBase", 0L).otherwise(1L)).as("cd"))
        .withColumn("bcum", coalesce(sum($"cb").over(wk), lit(0L)))
        .withColumn("dcum", coalesce(sum($"cd").over(wk), lit(0L)))
      val stats = grpC.select($"key", $"c", $"bcum", $"dcum",
        classOf($"cb" + $"cd", $"cd", length($"c"), len).as("cls"))
      val joined = pinned(withChunk.join(stats, Seq("key", "c")))
      n2Parts += contrib(
        joined.filter(!$"isBase" && ($"bcum" + $"dcum") > 0), $"bcum" + $"dcum")
      m2Parts += contrib(joined.filter($"isBase" && $"dcum" > 0), $"dcum")
      live = route(joined.select($"key", $"c", $"isBase", $"doc_id", $"pos",
          $"cls"), off + len)
        .select(concat($"key", $"c").as("key"), $"isBase", $"doc_id", $"pos")
        .localCheckpoint()
      off += len
    }
    lastMergeRounds = rounds

    // the pairwise kernel over every within-cap group, all rounds at
    // once: doc texts join ONCE per kernel row set, the comparison
    // starts at the verified offset, and the tie at the first
    // mismatch compares code POINTS (ADVICE r13)
    val kin = kernParts.reduce(_ unionByName _)
      .join(deltaDocs.select($"doc_id".as("dd"), $"text".as("td")), Seq("dd"))
      .join(texts.select($"doc_id".as("od"), $"isBase", $"text".as("to")),
        Seq("od", "isBase"))
      .select($"dd", $"dp".cast("int").as("dp"), $"od",
        $"op".cast("int").as("op"), $"isBase", $"so", $"td", $"to")
      .as[(Long, Int, Long, Int, Boolean, Int, String, String)]
    val cmp = pinned(kin.mapPartitions(_.map {
      case (dd, dp, od, op, isBase, so, td, to) =>
        val ld = td.length - (dp - 1)
        val lo = to.length - (op - 1)
        val lim = math.min(ld, lo)
        var i = so
        while (i < lim && td.charAt(dp - 1 + i) == to.charAt(op - 1 + i)) i += 1
        val oBelow =
          if (i < lim) to.codePointAt(op - 1 + i) < td.codePointAt(dp - 1 + i)
          else if (lo != ld) lo < ld // shorter suffix is a proper prefix
          else od < dd || (od == dd && op < dp) // identical strings
        MergeCmp(dd, dp.toLong, od, op.toLong, isBase, oBelow)
    }).toDF())
    lastMergeKernelRows = cmp.count()

    // per delta suffix: others strictly below it (cross-chunk counts +
    // terminal tie-breaks + kernel rows); per base suffix: delta
    // suffixes strictly below it, same decomposition
    val n2 = (n2Parts.toSeq :+ cmp.filter($"oBelow")
        .select($"dd".as("doc_id"), $"dp".as("pos"), lit(1L).as("add")))
      .reduce(_ unionByName _)
      .groupBy($"doc_id", $"pos").agg(sum($"add").as("n2"))
    val m2 = (m2Parts.toSeq :+ cmp.filter($"isBase" && !$"oBelow")
        .select($"od".as("doc_id"), $"op".as("pos"), lit(1L).as("add")))
      .reduce(_ unionByName _)
      .groupBy($"doc_id", $"pos").agg(sum($"add").as("m2"))
    val fD = dSuf.join(cum, Seq("g"))
      .join(n2, Seq("doc_id", "pos"), "left")
      .select((lit(1L) + $"blt" + $"dlt" + coalesce($"n2", lit(0L))).as("rank"),
        $"doc_id", $"pos")
    val fB = bSuf.join(cum.select($"g", $"dlt"), Seq("g"))
      .join(m2, Seq("doc_id", "pos"), "left")
      .select(($"brank" + $"dlt" + coalesce($"m2", lit(0L))).as("rank"),
        $"doc_id", $"pos")
    val raw = fD.unionByName(fB)
    if (!eager) raw
    else {
      val out = raw.localCheckpoint()
      toFree.foreach(_.unpersist(false))
      out
    }
  }

  /** (rank, doc_id, pos) — the committed suffix permutation. */
  def ranks(s: SparkSession, dir: String): DataFrame = {
    ensure(s, dir)
    ParquetIO.read(s, tableDir(dir, "ranks"))
  }

  /** (doc_id, st, en) — the committed disjoint LCP removal intervals
    * (every pool char position some other pool suffix shares ≥
    * [[LcpTrimMinSpan]] chars of prefix with, extended to the shared
    * extent and unioned per doc). q323 accounts over it, q325 rewrites
    * from it — one build, many consumers.
    */
  def cover(s: SparkSession, dir: String): DataFrame = {
    ensure(s, dir)
    ParquetIO.read(s, tableDir(dir, "cover"))
  }

  /** Disjoint per-doc union of (doc_id, st, en) interval rows: sort by
    * start, a running max of prior ends starts a new group at every gap
    * — a duplicated region of length L would otherwise explode ~L²/2
    * cover positions (every interior suffix re-lists its tail), and the
    * interval union is exact for both counts and membership tests. The
    * window is doc-partitioned — never a global sort.
    */
  private[operators] def unionIntervals(iv: DataFrame): DataFrame = {
    val s = iv.sparkSession
    import s.implicits._
    val wd = Window.partitionBy($"doc_id").orderBy($"st", $"en")
    iv.withColumn("pmax",
        max($"en").over(wd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("grp", sum(when($"pmax".isNull || $"st" > $"pmax", 1)
        .otherwise(0)).over(wd))
      .groupBy($"doc_id", $"grp").agg(min($"st").as("st"), max($"en").as("en"))
      .select($"doc_id", $"st", $"en")
  }

  /** The full cover derivation over a committed permutation: attach
    * each suffix's window ONCE, one rank self-join, window-resolved
    * LCPs by codegen'd mismatch scan, survivor-only char extension
    * (q315's discipline), per-suffix max over its two rank neighbors,
    * threshold, interval union. Runs at BUILD time only; returns a
    * localCheckpoint-materialized frame with every intermediate
    * unpersisted (ADVICE r13).
    */
  private def coverFromRanks(
      s: SparkSession, rk: DataFrame, pool: DataFrame): DataFrame = {
    import s.implicits._
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
    // suffix r is the high member of pair r, the low member of pair r+1)
    val lcpAll = winLcp.unionByName(extLcp).persist()
    val maxadj = lcpAll
      .unionByName(lcpAll.select(($"rank" - 1).as("rank"), $"lcp"))
      .groupBy($"rank").agg(max($"lcp").as("madj"))
      .filter($"madj" >= LcpTrimMinSpan)
    val out = unionIntervals(
      rk.join(maxadj, Seq("rank"))
        .select($"doc_id", $"pos".cast("long").as("st"),
          ($"pos".cast("long") + $"madj" - 1).as("en")))
      .localCheckpoint()
    wrk.unpersist(false); pairs.unpersist(false); lcpAll.unpersist(false)
    out
  }

  /** The O(delta) cover increment: every merged-rank-adjacent pair
    * touching a delta suffix (the delta's ranks ± 1 — ~2·|delta| pairs,
    * delta-delta adjacencies included), each compared char-exact once.
    * Base-base pairs still adjacent after the merge kept their LCP (no
    * suffix came between them), and pairs the merge SPLIT are dominated
    * by the two new flanking pairs (the inserted suffix shares at least
    * the split pair's common prefix) — so old intervals ∪ these is
    * EXACTLY the rebuild cover ([[graft.SuffixIndexSpec]] proves it at
    * the file level).
    */
  private def coverDeltaIntervals(s: SparkSession, merged: DataFrame,
      baseDocs: DataFrame, deltaDocs: DataFrame): DataFrame = {
    import s.implicits._
    val dIds = deltaDocs.select($"doc_id").distinct()
    val dRk = merged.join(dIds, Seq("doc_id")).select($"rank")
    // pair id = the HIGH member's rank; a delta suffix is the high
    // member of its own pair and the low member of pair (rank + 1)
    val hiRanks = dRk.unionByName(dRk.select(($"rank" + 1).as("rank"))).distinct()
    val pairs = merged.join(hiRanks, Seq("rank"))
      .select($"rank", $"doc_id".as("da"), $"pos".as("pa"))
      .join(merged.select(($"rank" + 1).as("rank"), $"doc_id".as("db"),
        $"pos".as("pb")), Seq("rank"))
    val texts = baseDocs.select($"doc_id", $"text")
      .unionByName(deltaDocs.select($"doc_id", $"text"))
    val st = pairs
      .join(texts.select($"doc_id".as("da"), $"text".as("ta")), Seq("da"))
      .join(texts.select($"doc_id".as("db"), $"text".as("tb")), Seq("db"))
      .select($"da", $"pa".cast("int").as("pa"), $"db",
        $"pb".cast("int").as("pb"), $"ta", $"tb")
      .as[(Long, Int, Long, Int, String, String)]
    val lcp = st.mapPartitions(_.map { case (da, pa, db, pb, ta, tb) =>
      val la = ta.length - (pa - 1)
      val lb = tb.length - (pb - 1)
      val lim = math.min(la, lb)
      var i = 0
      while (i < lim && ta.charAt(pa - 1 + i) == tb.charAt(pb - 1 + i)) i += 1
      (da, pa.toLong, db, pb.toLong, i.toLong)
    }).toDF("da", "pa", "db", "pb", "lcp")
      .filter($"lcp" >= LcpTrimMinSpan)
    lcp.select($"da".as("doc_id"), $"pa".as("st"), ($"pa" + $"lcp" - 1).as("en"))
      .unionByName(lcp.select($"db".as("doc_id"), $"pb".as("st"),
        ($"pb" + $"lcp" - 1).as("en")))
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
    * merge-counting (doubling-free, collision-bounded — see the method
    * doc). The oracle is q311's brute-force sorted-suffix
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
    val merged = mergeRanks(s, base, baseDocs, deltaDocs, eager = false)
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
    * token-level b-side policy stays q304's). Since round 14 the
    * interval set is the artifact's committed `cover` table ([[cover]]
    * — built once with the ranks, appended O(delta); VERDICT r13
    * "What's missing" #2), so the query itself is one artifact read +
    * the anchor arm. The ANCHOR arm runs the pool-world
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
  def q323LcpTrim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pool = Dedup.suffixPoolDocs(Tables.load(s, dir, "documents")).persist()
    val coverIv = cover(s, dir)
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
    * token→char-offset mapping. The engines read the committed `cover`
    * artifact; the oracle re-derives it relationally, so the hash
    * locks the artifact against first-principles truth on every run.
    */
  /** The adjacent-LCP → maxadj → position-cover chain plus the pool
    * frame — the oracle prefix shared by q323 and q325 (the cover is
    * position-form here; the engines' interval form counts and tests
    * identically).
    */
  private[operators] def lcpCoverCtes: String =
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
      |          -- coalesce: DuckDB's array_to_string([]) is NULL, so a
      |          -- pos=1 removal would otherwise lose its char start
      |          coalesce(len(array_to_string(
      |            list_slice(t.t, 1, CAST(b.pos - 1 AS INT)), ' ')), 0) +
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
    * interval set is the artifact's committed `cover` table (round 14 —
    * one build, two consumers), membership is one doc-equi + range
    * anti-join, and the kept-text hash is the q304
    * collect_list(struct(pos, ch)) → array_sort → md5 device — every
    * stage keyed on doc_id, nothing pairwise.
    */
  def q325LcpRewrite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pool = Dedup.suffixPoolDocs(Tables.load(s, dir, "documents")).persist()
    val cov = cover(s, dir)
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

  // ---------------------------------------------------------------- q328

  /** q328: SUBSTRING COMPLEXITY — the per-document consumer of the
    * committed permutation that the quality-filter family was missing:
    * the EXACT number of distinct substrings of each pool document,
    * via the suffix-array identity  distinct(d) = Σ|suffix| − Σ
    * LCP(rank-adjacent suffixes of d).  q43's Gopher/C4-style gauges
    * count duplicated token SHINGLES at one fixed width; the
    * distinct-substring ratio (distinct / n·(n+1)/2) is the char-exact,
    * every-width generalization — a heavily templated or repetitive
    * document has compressibility the fixed-width gauge underestimates
    * (the σ(d) statistic of compressed-indexing literature). The
    * doc-restricted order needs NO new sort: the global permutation
    * filtered to one document IS that document's own suffix array
    * (within-doc ties are impossible — equal suffixes of one string
    * are the same suffix), so one groupBy(doc_id) collects each doc's
    * rank-sorted positions and a per-doc kernel walks consecutive
    * pairs char-exact. Per-doc state is O(|doc|) positions + the text
    * — the mapPartitions family's bounded-group charter; nothing
    * pairwise, one shuffle. The oracle is deliberately INDEPENDENT of
    * the identity: it materializes every substring and counts
    * DISTINCT — hash equality proves the suffix-array algebra against
    * brute-force truth. The ratio is one exact-long division, the
    * cross-engine-deterministic double the q43 family established.
    */
  def q328SubstringComplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pool = Dedup.suffixPoolDocs(Tables.load(s, dir, "documents"))
    val perDoc = ranks(s, dir)
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"rank", $"pos"))).as("ps"))
      .join(pool, Seq("doc_id"))
      .select($"doc_id", $"ps", $"text")
      .as[(Long, Seq[(Long, Long)], String)]
    val stats = perDoc.mapPartitions(_.map { case (did, ps, text) =>
      val n = text.length
      var sumLen = 0L
      var sumLcp = 0L
      var prev = -1
      ps.foreach { case (_, posL) =>
        val pos = posL.toInt
        sumLen += (n - pos + 1).toLong
        if (prev > 0) {
          val lim = math.min(n - prev + 1, n - pos + 1)
          var i = 0
          while (i < lim && text.charAt(prev - 1 + i) == text.charAt(pos - 1 + i))
            i += 1
          sumLcp += i.toLong
        }
        prev = pos
      }
      (did, n.toLong, sumLen - sumLcp)
    }).toDF("doc_id", "n_chars", "n_distinct")
    stats.select($"doc_id", $"n_chars",
        // n(n+1)/2 exactly: Spark's / on longs is double division
        ($"n_chars" * ($"n_chars" + 1) / 2).cast("long").as("n_substr_total"),
        $"n_distinct",
        ($"n_distinct".cast("double") /
          ($"n_chars" * ($"n_chars" + 1) / 2))
          .as("distinct_ratio"))
      .orderBy($"doc_id")
  }

  private def q328Sql: String =
    s"""WITH pool AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE doc_id % ${Dedup.SufMod} = 0 AND len(text) >= 1),
      |subs AS (
      |  SELECT doc_id, substr(text, CAST(u.i AS INT), CAST(v.l AS INT)) AS s
      |  FROM pool,
      |    unnest(generate_series(1, len(text))) u(i),
      |    unnest(generate_series(1, len(text))) v(l)
      |  WHERE u.i + v.l - 1 <= len(text)),
      |d AS (SELECT doc_id, CAST(count(DISTINCT s) AS BIGINT) AS n_distinct
      |      FROM subs GROUP BY doc_id)
      |SELECT p.doc_id, CAST(len(p.text) AS BIGINT) AS n_chars,
      |  CAST(len(p.text) * (len(p.text) + 1) / 2 AS BIGINT) AS n_substr_total,
      |  d.n_distinct,
      |  CAST(d.n_distinct AS DOUBLE) /
      |    CAST(len(p.text) * (len(p.text) + 1) / 2 AS DOUBLE) AS distinct_ratio
      |FROM pool p JOIN d USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q328_substring_complexity", Seq("EXT-text", "EXT-dedup"),
      "per-document exact distinct-substring count via the committed suffix permutation (sum-of-suffix-lengths minus doc-restricted adjacent LCPs), proven against brute-force substring enumeration",
      q328SubstringComplexity, Some(q328Sql)),
    GraftQuery("q325_lcp_rewrite", Seq("EXT-dedup", "EXT-text"),
      "LCP trim rewrite: the cleaned pool corpus re-assembled from surviving char positions via the committed cover artifact, kept-text md5 per doc locking the exact rewrite",
      q325LcpRewrite, Some(q325Sql)),
    GraftQuery("q315_suffix_lcp", Seq("EXT-dedup", "EXT-text"),
      "suffix-array LCP layer: rank-adjacent window join + survivor-only char extension over the persisted permutation; variable-length duplicate spans + longest repeated substring",
      q315SuffixLcp, Some(q315Sql)),
    GraftQuery("q322_suffix_merge", Seq("EXT-dedup", "S6"),
      "incremental suffix-array maintenance: committed base permutation merged with the delta by window prefix-sums and bounded collision resolution (doubling-free, multiplicity-capped), proven equal to full-pool sorted-suffix truth",
      q322SuffixMerge, Some(Dedup.q311SqlShared)),
    GraftQuery("q323_lcp_trim", Seq("EXT-dedup", "EXT-text"),
      "LCP-driven variable-length char trim reading the committed cover artifact, with per-doc accounting proving it contains the pool-world anchor-gram removal set",
      q323LcpTrim, Some(q323Sql)))
}
