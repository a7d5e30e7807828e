package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.pipeline.ParquetIO

/** Materialized ANN index — build ONCE, query many.
  *
  * The round-6 ANN family retrained its coarse codebook (2 Lloyd rounds
  * + a full-corpus routing pass) inside EVERY query invocation: correct
  * and bounded, but the opposite of how a 100 TB vector corpus is
  * served, where an index job runs once per corpus version and every
  * search reads its artifacts. This object is that index job. It
  * persists, per source directory, via the [[ParquetIO]]
  * versioned-pointer protocol:
  *
  *  - `codebook_<salt>`  (centroid_id, cv, cnrm) — the fixed-k
  *    Lloyd-trained coarse quantizer ([[Similarity.ivfCodebook]]),
  *    ≤ [[Similarity.IvfK]] rows;
  *  - `cells_<salt>`     (vec_id, cell, rn) — every vector's top-
  *    [[MaxProbes]] centroids by rounded cosine (rn = probe rank), so
  *    ANY probe depth ≤ [[MaxProbes]] is a filter on one table, not a
  *    re-route;
  *  - `pq_codebook`      (s, cw, c1, c2, ccv) — the flattened product-
  *    quantization codebook ([[Similarity.trainPqCodebookFlat]]);
  *  - `pq_codes`         (vec_id, s, cw) — each vector's 16-byte PQ
  *    code in long form ([[Similarity.assignPqCodes]]).
  *
  * Freshness: an index commit records an md5 fingerprint of the source
  * `embeddings.parquet` file listing (name, size, mtime). `ensure`
  * fast-paths on a fingerprint match (a directory listing, no Spark
  * job); any source change — including a regenerated test corpus at the
  * same path — forces a full rebuild. The fingerprint marker is written
  * LAST, so a crashed build (mixed old/new table versions) is invisible:
  * the next `ensure` sees a missing/stale marker and rebuilds
  * everything. ONE listing snapshot, taken under the build lock, drives
  * the fingerprint, the append decision, AND the committed manifest —
  * with independent listings a file landing mid-build could be recorded
  * as covered without its vectors ever routing. Builds are
  * deterministic (md5-ranked sampling, exact-integer centroid means),
  * so a rebuild reproduces the identical artifact and the DuckDB oracle
  * can re-derive the same index relationally — correctness never
  * depends on WHEN the index was built.
  *
  * Concurrency: one build at a time per process (object lock) plus a
  * cross-process `_build.lock` carrying a `pid:nonce` ownership token
  * (the same protocol as [[ParquetIO]]'s writer lock, shared helpers).
  * A second process waits for the winner and fast-paths on the
  * committed fingerprint; a lock whose owner is verifiably dead is
  * stolen at once; an unverifiable owner is stolen past
  * [[ParquetIO.LockStaleMs]]; a verifiably LIVE holder past
  * [[lockTimeoutMs]] is an ERROR, never a steal — stealing a live
  * builder's lock would just make the pair collide on the per-table
  * writer locks. Release deletes the lock only if it still carries our
  * token. If a commit inside the build does hit a concurrent-writer
  * error (a previously stolen-from builder still flushing), the build
  * backs off, re-checks freshness, and retries instead of dying
  * mid-query.
  *
  * At 100 TB: the build is the one expensive pass (O(n·k) routing, PQ
  * assignment — both scan-shaped with tiny broadcasts); searches then
  * read cells/codes with probe-rank filters pushed to the parquet scan.
  * Incremental corpus growth is IMPLEMENTED ([[incrementalDelta]] /
  * [[appendBuild]]): when `ensure` finds the committed manifest to be a
  * strict subset of the source listing (old files untouched, new files
  * added), only the new vectors route — against the FROZEN codebooks,
  * the standard IVF add-after-train contract — and their cells/codes
  * commit as hard-linked append-versions, O(delta) work end to end on
  * BOTH sides: the delta routes against broadcast codebooks, and retry
  * idempotency comes from a per-version `_sources` file listing which
  * source files each table version covers (committed atomically with
  * the data by the pointer flip), not from an O(index) vec_id
  * anti-join. "Retrain on drift, not per batch" is enforced, not just
  * documented: the build persists the base corpus's quantization-error
  * distribution (mean and p95 of nearest-centroid cosine distance per
  * salt, `_drift`), and an append whose delta's mean error exceeds the
  * base p95 for any salt falls back to a full retrain. NOTE the
  * oracle-identity caveat: the gate corpora are regenerated whole-file
  * each round, so the gate always takes the full-rebuild arm and the
  * DuckDB oracle's full-corpus re-derivation stays exact; a corpus
  * grown incrementally would (correctly, by the frozen-codebook
  * contract) diverge from a from-scratch retrain.
  */
object AnnIndex extends ArtifactStore {

  /** Deepest probe rank materialized in `cells_<salt>` — queries tune
    * probe depth 1..MaxProbes as a pushed-down filter on `rn`.
    */
  val MaxProbes = 8

  /** Salts = independent training runs (seed-sensitivity measurement,
    * q53). "a" carries q45; "b" carries q54/q60/q137 and the harness.
    */
  val Salts = Seq("a", "b")

  protected def storeKind: String = "ann"

  /** AnnIndex predates [[ArtifactStore]] and keeps its unsuffixed
    * per-source keys (committed indexes stay addressable).
    */
  protected override def keySuffix: String = ""

  protected def allTables: Seq[String] =
    Salts.flatMap(s => Seq(s"codebook_$s", s"cells_$s")) ++
      Seq("pq_codebook", "pq_codes")

  /** The per-vector row tables an append grows (codebooks are frozen). */
  protected override def appendTables: Seq[String] =
    Salts.map(s => s"cells_$s") :+ "pq_codes"

  /** The append arm additionally needs the `_drift` yardstick a full
    * build persisted (pre-upgrade indexes rebuild).
    */
  protected override def appendRecordsIntact(root: Path): Boolean =
    Files.exists(root.resolve("_drift"))

  protected def listing(dir: String): Seq[(String, String)] =
    tableListing(dir, "embeddings")

  /** Bump on ANY trainer-algorithm change the numeric knobs below don't
    * capture — Lloyd round count, sampling key formula, rounding
    * precision, assignment tie-break, salt set. The committed index is
    * a pure function of (source bytes, knobs, algorithm); this constant
    * stands in for the algorithm term.
    */
  val TrainerAlgoVersion = 1

  /** The trainer geometry baked into the committed artifacts; part of
    * the freshness fingerprint, so changing any knob (k ceiling, sample
    * size, probe depth, PQ shape, quantum, salts — or, via
    * [[TrainerAlgoVersion]], the training algorithm itself) invalidates
    * every index built with the old values — without this, a code
    * change would silently serve stale codebooks that no longer match
    * the oracle's re-derivation.
    */
  protected def geometry: String = (Seq(
    TrainerAlgoVersion,
    Similarity.IvfK, Similarity.IvfSampleN, MaxProbes,
    Similarity.PqSubspaces, Similarity.PqSubDim, Similarity.PqCodewords
  ) ++ Salts).mkString("g:", ",", "")

  /** Base-corpus quantization-error distribution per salt, persisted at
    * build time as `_drift` lines `salt:mean:p95` where the error is
    * the nearest-centroid cosine DISTANCE (1 - rounded cosine). The
    * append arm gauges its delta against these frozen numbers.
    */
  private def readDrift(root: Path): Map[String, (Double, Double)] = {
    val f = root.resolve("_drift")
    if (!Files.exists(f)) Map.empty
    else Files.readString(f).split("\n", -1).filter(_.nonEmpty).map { l =>
      val Array(salt, mean, p95) = l.split(":", 3)
      salt -> (mean.toDouble, p95.toDouble)
    }.toMap
  }

  /** Route (vec_id, v, nrm) vectors against a codebook: top-
    * [[MaxProbes]] cells per vector by rounded cosine, with the score
    * retained for the drift gauge.
    */
  private def routed(s: SparkSession, e: DataFrame, cb: DataFrame): DataFrame = {
    import s.implicits._
    val wc = Window.partitionBy($"vec_id")
      .orderBy($"csim".desc, $"centroid_id".asc)
    e.crossJoin(broadcast(cb))
      .select($"vec_id", $"centroid_id",
        round(Similarity.dot($"v", $"cv") / ($"nrm" * $"cnrm"), 6).as("csim"))
      .withColumn("rn", row_number().over(wc))
      .filter($"rn" <= MaxProbes)
  }

  /** Mean nearest-centroid cosine distance of a routed set — the
    * quantization-error statistic both sides of the drift gauge use.
    */
  private def meanNearestDist(s: SparkSession, scored: DataFrame): Double = {
    import s.implicits._
    scored.filter($"rn" === 1)
      .agg(avg(lit(1.0) - $"csim")).head().getDouble(0)
  }

  /** The incremental arm of the index job: route ONLY the new files'
    * vectors against the FROZEN committed codebooks and append their
    * cells/codes. Returns false — take the full-rebuild arm instead —
    * when the delta has DRIFTED off the base distribution (mean
    * nearest-centroid distance above the base p95 for any salt): frozen
    * codebooks would silently degrade recall on such a batch, and
    * "retrain on drift" is this index's stated contract. Each append
    * commits as a fresh hard-linked version ([[ParquetIO
    * .appendAsVersion]]) — crash-invisible, O(delta) I/O — and each
    * table's per-version `_sources` record scopes a retried append
    * (crash after some tables, before the fingerprint) to exactly the
    * files that table has not yet landed: idempotency without reading
    * the index.
    */
  protected def appendBuild(s: SparkSession, root: Path,
      newFiles: Seq[(String, String)], snap: Seq[(String, String)]): Boolean = {
    import s.implicits._
    val baseStats = readDrift(root)
    if (Salts.exists(salt => !baseStats.contains(salt))) return false
    val e = s.read.parquet(newFiles.map(_._2): _*)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", Similarity.norm($"v"))
      .repartition(s.sparkContext.defaultParallelism)
      .persist()
    val scoredBySalt = Salts.map { salt =>
      val cb = ParquetIO.read(s, root.resolve(s"codebook_$salt").toString)
      salt -> routed(s, e, cb).persist()
    }.toMap
    try {
      // drift gauge BEFORE any commit: an append that needs a retrain
      // must not half-land first. Trigger = the delta's mean error sits
      // beyond the base's p95 TAIL and at 2× its center — i.e. the
      // delta quantizes at least twice as badly as the base did. The 2×
      // guard absorbs training-set optimism: on a toy corpus the Lloyd
      // sample IS the corpus, so base stats are in-sample-flattered
      // (measured on sf0.001 halves: base mean 0.50 vs an
      // in-distribution delta's 0.86 — a 1.7× gap with ZERO real
      // drift); at production scale the sample is a vanishing fraction
      // and the stats are effectively out-of-sample, so a genuine
      // distribution shift (error doubling) clears 2× easily.
      val drifted = Salts.exists { salt =>
        val (baseMean, baseP95) = baseStats(salt)
        meanNearestDist(s, scoredBySalt(salt)) > math.max(baseP95, 2.0 * baseMean)
      }
      if (drifted) return false
      for (salt <- Salts) {
        val table = s"cells_$salt"
        val applied = appliedSources(root, table).getOrElse(Set.empty)
        val sub = newFiles.filterNot(f => applied.contains(f._1))
        if (sub.nonEmpty) {
          val all = scoredBySalt(salt)
          // a retry appends only the files this table hasn't landed yet;
          // the semi-join reads just the vec_id column of those files
          val rows =
            if (sub.size == newFiles.size) all
            else all.join(
              s.read.parquet(sub.map(_._2): _*).select($"vec_id"),
              Seq("vec_id"), "left_semi")
          ParquetIO.appendAsVersion(
            rows.select($"vec_id", $"centroid_id".as("cell"), $"rn"),
            root.resolve(table).toString)
          writeSources(root, table, applied ++ sub.map(_._1))
        }
      }
      val codesApplied = appliedSources(root, "pq_codes").getOrElse(Set.empty)
      val codesSub = newFiles.filterNot(f => codesApplied.contains(f._1))
      if (codesSub.nonEmpty) {
        val vecs =
          if (codesSub.size == newFiles.size) e.select($"vec_id", $"v")
          else e.select($"vec_id", $"v").join(
            s.read.parquet(codesSub.map(_._2): _*).select($"vec_id"),
            Seq("vec_id"), "left_semi")
        val codes = Similarity.assignPqCodes(s, vecs,
          ParquetIO.read(s, root.resolve("pq_codebook").toString))
        ParquetIO.appendAsVersion(codes, root.resolve("pq_codes").toString)
        writeSources(root, "pq_codes", codesApplied ++ codesSub.map(_._1))
      }
      true
    } finally {
      scoredBySalt.values.foreach(_.unpersist(false))
      e.unpersist(false)
    }
  }

  /** The one expensive pass: train both codebooks, route the corpus to
    * its top-[[MaxProbes]] cells per salt, assign PQ codes. Each table
    * commits atomically via the versioned pointer. Reads EXACTLY the
    * snapshot's files (not the directory) so the `_sources` records are
    * true of the rows; persists the base quantization-error stats
    * (`_drift`) alongside, the frozen yardstick future appends gauge
    * drift against.
    */
  protected def build(
      s: SparkSession, root: Path, snap: Seq[(String, String)]): Unit = {
    import s.implicits._
    require(snap.nonEmpty, s"ANN index build: no embeddings files under $root")
    val snapLines = snap.map(_._1).toSet
    val e = s.read.parquet(snap.map(_._2): _*)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", Similarity.norm($"v"))
      .repartition(s.sparkContext.defaultParallelism)
      .persist()
    try {
      val drift = Salts.map { salt =>
        val cb = Similarity.ivfCodebookOf(s, e.select($"vec_id", $"v"), salt)
        ParquetIO.overwriteSwap(
          cb.select($"centroid_id", $"cv", $"cnrm"),
          root.resolve(s"codebook_$salt").toString)
        val scored = routed(s, e, cb).persist()
        try {
          ParquetIO.overwriteSwap(
            scored.select($"vec_id", $"centroid_id".as("cell"), $"rn"),
            root.resolve(s"cells_$salt").toString)
          writeSources(root, s"cells_$salt", snapLines)
          val mean = meanNearestDist(s, scored)
          val p95 = scored.filter($"rn" === 1)
            .agg(expr("percentile_approx(1.0 - csim, 0.95, 10000)"))
            .head().getDouble(0)
          s"$salt:$mean:$p95"
        } finally scored.unpersist(false)
      }
      val cbFlat = Similarity.trainPqCodebookFlatOf(s, e.select($"vec_id", $"v"))
      ParquetIO.overwriteSwap(cbFlat, root.resolve("pq_codebook").toString)
      ParquetIO.overwriteSwap(
        Similarity.assignPqCodes(s, e.select($"vec_id", $"v"),
          ParquetIO.read(s, root.resolve("pq_codebook").toString)),
        root.resolve("pq_codes").toString)
      writeSources(root, "pq_codes", snapLines)
      writeAtomic(root, "_drift", drift.mkString("\n"))
    } finally e.unpersist(false)
  }

  private def read(s: SparkSession, dir: String, name: String): DataFrame = {
    ensure(s, dir)
    ParquetIO.read(s, tableDir(dir, name))
  }

  /** (centroid_id, cv, cnrm) — ≤ [[Similarity.IvfK]] rows. */
  def codebook(s: SparkSession, dir: String, salt: String): DataFrame =
    read(s, dir, s"codebook_$salt")

  /** (vec_id, cell, rn ≤ maxProbes) — probe depth as a pushed filter. */
  def cells(s: SparkSession, dir: String, salt: String, maxProbes: Int): DataFrame = {
    require(maxProbes >= 1 && maxProbes <= MaxProbes,
      s"probe depth $maxProbes outside materialized range [1, $MaxProbes]")
    val df = read(s, dir, s"cells_$salt")
    if (maxProbes == MaxProbes) df else df.filter(col("rn") <= maxProbes)
  }

  /** (s, cw, c1, c2, ccv) — flattened PQ codebook, m×k = 512 rows. */
  def pqCodebookFlat(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "pq_codebook")

  /** (vec_id, s, cw) — long-form PQ codes, m rows per vector. */
  def pqCodes(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "pq_codes")
}
