package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.pipeline.ParquetIO

/** Materialized customer–supplier interaction graph — build ONCE, query
  * many (the [[AnnIndex]] discipline applied to edges).
  *
  * Through round 10 every graph-family query (PageRank q89/q133, LPA
  * q140/q157, BFS q145, PPR q224, HyperBall q231, random walks q235,
  * assortativity q262) re-derived the SAME edge list per invocation:
  * orders ⋈ lineitem, project to ("c"+custkey, "s"+suppkey), distinct,
  * union-reverse. Correct and self-contained, but 8 of the 12 most
  * expensive bench queries were paying that identical rebuild — and at
  * 100 TB nobody re-joins two fact tables into a trillion-edge graph
  * per query. This object is the graph's index job: one expensive
  * derivation pass, committed via the [[ParquetIO]] versioned-pointer
  * protocol, then every query reads two compact parquet tables:
  *
  *  - `edges`   (src, dst)  — the UNDIRECTED distinct edge list (both
  *    directions materialized, the form every consumer wants);
  *  - `degrees` (src, deg)  — per-node degree over that edge list, the
  *    iteration-invariant the PageRank family pre-joins once (hoisted
  *    round 10; the artifact makes the hoist free for q224 too);
  *  - `support` (src, dst, support) — co-supply pair support (distinct
  *    (order, supplier) self-join within the order), the SUFFICIENT
  *    STATISTIC of the k-NN sparsification: appends merge increments
  *    into it instead of re-scanning history;
  *  - `knn` (sa, sb) — the deterministic top-[[KnnK]] cut of `support`
  *    (the q102/q202/q203/q208 substrate, previously re-derived by a
  *    lineitem self-join inside each query).
  *
  * Freshness/locking are [[AnnIndex]]'s exact protocol: an md5
  * fingerprint of the SOURCE listing (orders + lineitem file
  * name:size:mtime lines, plus the algorithm version) fast-paths
  * `ensure` to a directory listing; the fingerprint marker commits
  * LAST so a crashed build is invisible; one in-process lock plus a
  * cross-process `_build.lock` with pid:nonce ownership (shared
  * [[ParquetIO]] helpers), steal-if-dead / error-if-live-past-timeout.
  *
  * Incremental growth ([[appendBuild]]): when the committed manifest is
  * a strict subset of the source listing — old files byte-identical,
  * new files appended — only the NEW files derive edges. The contract
  * is transactional fact ingest (an order lands in the same batch as
  * its lineitems — TPC-H referential integrity; the standard warehouse
  * append cadence), so the delta edge set is ordersΔ ⋈ lineitemΔ: the
  * big historical lineitem table is never re-scanned (a one-sided
  * batch, whose counterpart rows could hide in old files, falls back
  * to the full rebuild rather than risk losing edges). Delta edges
  * anti-join the edge ARTIFACT (one scan of the compact index, never
  * the raw facts) to drop already-known pairs, land as a hard-linked
  * [[ParquetIO.appendAsVersion]], and degrees update by an O(nodes +
  * delta) merge (old degrees ⟗ delta increments). Retry idempotency:
  * per-version `_sources` records on BOTH tables (committed atomically
  * with the data by the pointer flip); a crash between the edge commit
  * and the degree commit is healed by recounting degrees from the
  * committed edge artifact — the one recovery path that needs no
  * memory of the torn batch.
  *
  * Correctness never depends on WHEN the index was built: the artifact
  * is a pure function of the source bytes (distinct set, exact integer
  * counts), so every existing graph query's DuckDB oracle — which
  * re-derives edges from the raw tables relationally — stays exact,
  * and q302 oracle-carries the append algebra itself (appended graph ≡
  * full rebuild, see [[q302GraphAppend]]).
  *
  * Reference anchor: the reference pipeline's one join
  * (`cr_company_complete.sql:40-41`) materializes a derived table its
  * downstream models read rather than re-deriving — this artifact is
  * that staging discipline applied to the graph family.
  */
object GraphIndex extends ArtifactStore {

  /** Bump on ANY change to the edge-derivation algebra (key formula,
    * prefixes, distinct semantics, degree definition) — invalidates
    * every committed index built with the old algorithm.
    */
  val AlgoVersion = 1

  /** Top-k partners per supplier in the co-supply sparsification (see
    * [[knnEdges]]) — part of the geometry fingerprint.
    */
  val KnnK = 3

  protected def storeKind: String = "graph"
  protected def geometry: String = s"g:$AlgoVersion,$KnnK"
  protected def allTables: Seq[String] = Seq("edges", "degrees", "support", "knn")

  private val SourceTables = Seq("orders", "lineitem")

  /** One `table/name:size:mtime` line per data file across both source
    * tables.
    */
  protected def listing(dir: String): Seq[(String, String)] =
    SourceTables.flatMap(table => tableListing(dir, table, s"$table/"))

  /** The undirected distinct edge derivation over EXPLICIT file lists
    * (never the directory — the `_sources` records must be true of the
    * rows). Empty on either side = no edges: under the transactional
    * ingest contract an order and its lineitems land together, so a
    * one-sided batch cannot complete an edge.
    */
  private def deriveEdges(
      s: SparkSession, ordersFiles: Seq[String], lineitemFiles: Seq[String]): DataFrame = {
    import s.implicits._
    if (ordersFiles.isEmpty || lineitemFiles.isEmpty)
      return Seq.empty[(String, String)].toDF("src", "dst")
    val o = s.read.parquet(ordersFiles: _*).select($"o_orderkey", $"o_custkey")
    val l = s.read.parquet(lineitemFiles: _*).select($"l_orderkey", $"l_suppkey")
    val e0 = o.join(l, $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("src"),
        concat(lit("s"), $"l_suppkey").as("dst"))
      .distinct()
    e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
  }

  private def splitByTable(files: Seq[(String, String)]): (Seq[String], Seq[String]) =
    (files.collect { case (line, p) if line.startsWith("orders/") => p },
      files.collect { case (line, p) if line.startsWith("lineitem/") => p })

  /** The one expensive pass: derive edges + degrees from exactly the
    * snapshot's files and commit both atomically.
    */
  /** Co-supply pair support over exactly these lineitem files: distinct
    * (orderkey, suppkey) self-joined within the order, counted per
    * DIRECTED supplier pair — the sufficient statistic the k-NN cut
    * derives from, and the table the append arm merges O(delta).
    * Within-order pairing is why the transactional batch contract
    * makes the delta exact: an order's lineitems never straddle
    * batches, so no cross-batch pair can exist.
    */
  private def deriveSupport(s: SparkSession, lineitemFiles: Seq[String]): DataFrame = {
    import s.implicits._
    if (lineitemFiles.isEmpty)
      return Seq.empty[(Long, Long, Long)].toDF("src", "dst", "support")
    val base = s.read.parquet(lineitemFiles: _*)
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk")).distinct()
    base.as("a").join(base.as("b"), Seq("ok"))
      .filter($"a.sk" =!= $"b.sk")
      .groupBy($"a.sk".as("src"), $"b.sk".as("dst"))
      .agg(count(lit(1)).as("support"))
  }

  /** The deterministic top-[[KnnK]] cut of a support table into the
    * canonical (sa < sb) sparsified edge list — O(support table), the
    * cheap re-cut an append pays after merging increments.
    */
  private def knnCut(support: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wK = Window.partitionBy(col("src"))
      .orderBy(col("support").desc, col("dst").asc)
    support.withColumn("rn", row_number().over(wK))
      .filter(col("rn") <= KnnK)
      .select(least(col("src"), col("dst")).as("sa"),
        greatest(col("src"), col("dst")).as("sb"))
      .distinct()
  }

  protected def build(s: SparkSession, root: Path, snap: Seq[(String, String)]): Unit = {
    import s.implicits._
    require(snap.nonEmpty, s"graph index build: no orders/lineitem files for $root")
    val (of, lf) = splitByTable(snap)
    val edges = deriveEdges(s, of, lf)
      .repartition(s.sparkContext.defaultParallelism, $"src")
      .persist()
    val lines = snap.map(_._1).toSet
    try {
      ParquetIO.overwriteSwap(edges, root.resolve("edges").toString)
      ParquetIO.overwriteSwap(
        edges.groupBy($"src").agg(count(lit(1)).as("deg")),
        root.resolve("degrees").toString)
      writeSources(root, "edges", lines)
      writeSources(root, "degrees", lines)
    } finally edges.unpersist(false)
    val support = deriveSupport(s, lf).persist()
    try {
      ParquetIO.overwriteSwap(support, root.resolve("support").toString)
      ParquetIO.overwriteSwap(knnCut(support), root.resolve("knn").toString)
      writeSources(root, "support", lines)
      writeSources(root, "knn", lines)
    } finally support.unpersist(false)
  }

  /** The incremental arm: derive edges from ONLY the new files, drop
    * pairs the artifact already holds (one scan of the compact edge
    * index, never the raw facts), hard-link-append them, and merge the
    * degree increments — O(delta + nodes) end to end. A torn previous
    * attempt (edges committed, degrees not) is healed by recounting
    * degrees from the committed edge artifact.
    */
  protected def appendBuild(s: SparkSession, root: Path,
      newFiles: Seq[(String, String)], snap: Seq[(String, String)]): Boolean = {
    import s.implicits._
    val edgesT = root.resolve("edges").toString
    val degT = root.resolve("degrees").toString
    val eApplied0 = appliedSources(root, "edges").getOrElse(return false)
    val eSub = newFiles.filterNot(f => eApplied0.contains(f._1))
    val eAppliedAfter = eApplied0 ++ eSub.map(_._1)

    if (eSub.nonEmpty) {
      val (of, lf) = splitByTable(eSub)
      // a ONE-SIDED batch breaks the transactional contract: its edge
      // counterparts may live in OLD files, and completing them would
      // re-scan the raw facts — which is exactly the rebuild arm. Fall
      // back rather than silently losing edges.
      if (of.isEmpty || lf.isEmpty) return false
      // materialize BEFORE the append commit: the anti-join must run
      // against the pre-append artifact, and the degree merge below
      // must see the same rows without re-evaluating the plan.
      // Dedup against the artifact WITHOUT shuffling it: the delta is
      // batch-sized (a delta rivaling the artifact should rebuild), so
      // broadcast it, semi-join to pull the already-known pairs out of
      // one artifact SCAN, then anti-join the (≤ delta-sized) matches
      // back — the big table never crosses an exchange.
      val dE = deriveEdges(s, of, lf).persist()
      val known = ParquetIO.read(s, edgesT)
        .join(broadcast(dE), Seq("src", "dst"), "left_semi")
      val newE = dE.join(broadcast(known), Seq("src", "dst"), "left_anti")
        .persist()
      // the write below materializes newE through the cache; degInc then
      // reads the cached rows — ParquetIO.read pinned the PRE-append
      // edge version at plan time, so no step can see its own output
      val degInc = newE.groupBy($"src").agg(count(lit(1)).as("dinc"))
      try {
        ParquetIO.appendAsVersion(newE, edgesT)
        writeSources(root, "edges", eAppliedAfter)
        if (appliedSources(root, "degrees").contains(eApplied0)) {
          // normal path: O(nodes + delta) merge of the increments
          val merged = ParquetIO.read(s, degT)
            .join(degInc, Seq("src"), "full")
            .select($"src",
              (coalesce($"deg", lit(0L)) + coalesce($"dinc", lit(0L))).as("deg"))
          ParquetIO.overwriteSwap(merged, degT)
        } else {
          // torn retry: the degree table lags by an unknown batch —
          // recount from the committed edge artifact (always correct)
          ParquetIO.overwriteSwap(
            ParquetIO.read(s, edgesT).groupBy($"src").agg(count(lit(1)).as("deg")),
            degT)
        }
        writeSources(root, "degrees", eAppliedAfter)
      } finally { newE.unpersist(false); dE.unpersist(false) }
    } else if (!appliedSources(root, "degrees").contains(eAppliedAfter)) {
      // edges fully landed on a previous attempt, degrees did not
      ParquetIO.overwriteSwap(
        ParquetIO.read(s, edgesT).groupBy($"src").agg(count(lit(1)).as("deg")),
        degT)
      writeSources(root, "degrees", eAppliedAfter)
    }

    // co-supply lane: merge the delta's pair-support increments into the
    // persisted sufficient statistic (full-outer sum, O(support + delta)
    // — support is NOT derivable from the knn cut, which is why the
    // statistic itself is the committed table), then re-cut the
    // deterministic top-K edge list from the merged table. The read
    // inside overwriteSwap is pinned to the pre-swap version, the same
    // device the degree merge relies on.
    val supT = root.resolve("support").toString
    val knnT = root.resolve("knn").toString
    val sApplied0 = appliedSources(root, "support").getOrElse(return false)
    val sSub = newFiles.filterNot(f => sApplied0.contains(f._1))
    val sAppliedAfter = sApplied0 ++ sSub.map(_._1)
    if (sSub.nonEmpty) {
      val (_, lfS) = splitByTable(sSub)
      val dSup = deriveSupport(s, lfS)
      val merged = ParquetIO.read(s, supT)
        .withColumnRenamed("support", "s0")
        .join(dSup.withColumnRenamed("support", "s1"), Seq("src", "dst"), "full")
        .select($"src", $"dst",
          (coalesce($"s0", lit(0L)) + coalesce($"s1", lit(0L))).as("support"))
      ParquetIO.overwriteSwap(merged, supT)
      writeSources(root, "support", sAppliedAfter)
      ParquetIO.overwriteSwap(knnCut(ParquetIO.read(s, supT)), knnT)
      writeSources(root, "knn", sAppliedAfter)
    } else if (!appliedSources(root, "knn").contains(sAppliedAfter)) {
      // torn retry: support landed, the cut did not — re-cut (cheap)
      ParquetIO.overwriteSwap(knnCut(ParquetIO.read(s, supT)), knnT)
      writeSources(root, "knn", sAppliedAfter)
    }
    true
  }

  private def read(s: SparkSession, dir: String, name: String): DataFrame = {
    ensure(s, dir)
    ParquetIO.read(s, tableDir(dir, name))
  }

  /** (src, dst) — the undirected distinct customer–supplier edge list. */
  def edges(s: SparkSession, dir: String): DataFrame = read(s, dir, "edges")

  /** (src, deg) — per-node degree over [[edges]]. */
  def degrees(s: SparkSession, dir: String): DataFrame = read(s, dir, "degrees")

  /** (sa, sb) — the canonical (sa < sb) k-NN-sparsified co-supply edge
    * list (top-[[KnnK]] partners per supplier by shared-order support):
    * the shared substrate of the q102 triangle census, q202 k-core,
    * q203 clustering profile and q208 k-truss, previously re-derived by
    * a lineitem self-join inside each. The per-pair support statistic
    * is persisted alongside (`support`) so appends merge increments and
    * re-cut — never re-scan history.
    */
  def knnEdges(s: SparkSession, dir: String): DataFrame = read(s, dir, "knn")

  /** (src, dst, deg) — edges pre-annotated with the source node's
    * degree: the iteration-invariant join the PageRank family hoists,
    * done ONCE per query against two compact artifact scans.
    */
  def degEdges(s: SparkSession, dir: String): DataFrame = {
    ensure(s, dir)
    ParquetIO.read(s, tableDir(dir, "edges"))
      .join(ParquetIO.read(s, tableDir(dir, "degrees")), Seq("src"))
  }

  // ---------------------------------------------------------------- q302

  /** q302: GRAPH APPEND ≡ FULL REBUILD — the oracle-carried equivalence
    * proof for [[appendBuild]]'s algebra, run in-query over the q301
    * delta convention (orderkey % 10 = 7 marks the appended batch, the
    * transactional contract pairing each delta order with its delta
    * lineitems). The base graph plays the committed artifact: delta
    * edges derive from ONLY the delta rows, anti-join the base edge set
    * (already-known pairs drop), and degrees update by the full-outer
    * increment merge — exactly the code path the artifact's append arm
    * runs. The output is the per-side degree histogram of the merged
    * graph, which the oracle computes from a FULL single-pass rebuild
    * over all orders ⋈ lineitem: any append-arm defect (a lost edge, a
    * double-counted duplicate, a stale degree) shifts a histogram
    * bucket and breaks the hash. O(delta + nodes) on the append side,
    * never O(corpus).
    */
  def q302GraphAppend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def t(n: String) = Tables.load(s, dir, n)
    def und(e0: DataFrame) =
      e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
    def edgesOf(o: DataFrame, l: DataFrame) = und(
      o.join(l, $"o_orderkey" === $"l_orderkey")
        .select(concat(lit("c"), $"o_custkey").as("src"),
          concat(lit("s"), $"l_suppkey").as("dst"))
        .distinct())
    val o = t("orders").select($"o_orderkey", $"o_custkey")
    val l = t("lineitem").select($"l_orderkey", $"l_suppkey")
    val baseE = edgesOf(o.filter($"o_orderkey" % 10 =!= 7),
      l.filter($"l_orderkey" % 10 =!= 7)).persist()
    val deltaE = edgesOf(o.filter($"o_orderkey" % 10 === 7),
      l.filter($"l_orderkey" % 10 === 7))
    val newE = deltaE.join(baseE, Seq("src", "dst"), "left_anti")
    val degBase = baseE.groupBy($"src").agg(count(lit(1)).as("deg"))
    val degInc = newE.groupBy($"src").agg(count(lit(1)).as("dinc"))
    val merged = degBase.join(degInc, Seq("src"), "full")
      .select($"src",
        (coalesce($"deg", lit(0L)) + coalesce($"dinc", lit(0L))).as("deg"))
    merged
      .groupBy(substring($"src", 1, 1).as("side"), $"deg")
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy($"side", $"deg")
  }

  /** The oracle rebuilds the WHOLE graph in one pass — equality with the
    * Spark arm's base+append composition is the theorem under test.
    */
  private val q302Sql =
    """WITH e0 AS (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1)
      |SELECT substr(src, 1, 1) AS side, deg, CAST(count(*) AS BIGINT) AS n_nodes
      |FROM d
      |GROUP BY 1, 2
      |ORDER BY side, deg""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q302_graph_append", Seq("EXT-graph", "S6"),
      "incremental graph maintenance: delta-only edge derivation + anti-join dedup + degree-increment merge, proven equal to a full rebuild",
      q302GraphAppend, Some(q302Sql)))
}
