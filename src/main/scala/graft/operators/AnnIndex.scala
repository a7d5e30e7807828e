package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
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
  *    code in long form ([[Similarity.trainPqCodes]]).
  *
  * Freshness: an index commit records an md5 fingerprint of the source
  * `embeddings.parquet` file listing (name, size, mtime). `ensure`
  * fast-paths on a fingerprint match (a directory listing, no Spark
  * job); any source change — including a regenerated test corpus at the
  * same path — forces a full rebuild. The fingerprint marker is written
  * LAST, so a crashed build (mixed old/new table versions) is invisible:
  * the next `ensure` sees a missing/stale marker and rebuilds
  * everything. Builds are deterministic (md5-ranked sampling,
  * exact-integer centroid means), so a rebuild reproduces the identical
  * artifact and the DuckDB oracle can re-derive the same index
  * relationally — correctness never depends on WHEN the index was
  * built.
  *
  * Concurrency: one build at a time per process (object lock) plus a
  * best-effort cross-process `_build.lock` file (atomic create-new).
  * A second process either waits for the winner and then fast-paths on
  * the committed fingerprint, or — past [[LockTimeoutMs]] — steals a
  * stale lock (deterministic builds make the race benign in content;
  * the versioned pointer keeps each table's commit atomic).
  *
  * At 100 TB: the build is the one expensive pass (O(n·k) routing, PQ
  * assignment — both scan-shaped with tiny broadcasts); searches then
  * read cells/codes with probe-rank filters pushed to the parquet scan.
  * Incremental corpus growth is IMPLEMENTED ([[incrementalDelta]] /
  * [[appendBuild]]): when `ensure` finds the committed manifest to be a
  * strict subset of the source listing (old files untouched, new files
  * added), only the new vectors route — against the FROZEN codebooks,
  * the standard IVF add-after-train contract (retrain on drift, not
  * per batch) — and their cells/codes commit as hard-linked
  * append-versions, O(delta) work end to end. NOTE the oracle-identity
  * caveat: the gate corpora are regenerated whole-file each round, so
  * the gate always takes the full-rebuild arm and the DuckDB oracle's
  * full-corpus re-derivation stays exact; a corpus grown incrementally
  * would (correctly, by the frozen-codebook contract) diverge from a
  * from-scratch retrain.
  */
object AnnIndex {

  /** Deepest probe rank materialized in `cells_<salt>` — queries tune
    * probe depth 1..MaxProbes as a pushed-down filter on `rn`.
    */
  val MaxProbes = 8

  /** Salts = independent training runs (seed-sensitivity measurement,
    * q53). "a" carries q45; "b" carries q54/q60/q137 and the harness.
    */
  val Salts = Seq("a", "b")

  val LockTimeoutMs = 600000L

  private def allTables: Seq[String] =
    Salts.flatMap(s => Seq(s"codebook_$s", s"cells_$s")) ++
      Seq("pq_codebook", "pq_codes")

  /** Index artifacts live OUTSIDE the read-only source directory, keyed
    * by its absolute path: distinct corpora (sf dirs, scale-smoke
    * replicas) never share an index.
    */
  def indexRoot: String = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
    Paths.get(sys.props("java.io.tmpdir"), "graft-ann-index").toString)

  private def rootFor(dir: String): Path = {
    val abs = Paths.get(dir).toAbsolutePath.toString
    val key = abs.replaceAll("[^A-Za-z0-9._-]", "_")
    Paths.get(indexRoot, key)
  }

  def tableDir(dir: String, name: String): String =
    rootFor(dir).resolve(name).toString

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
  private def geometry: String = (Seq(
    TrainerAlgoVersion,
    Similarity.IvfK, Similarity.IvfSampleN, MaxProbes,
    Similarity.PqSubspaces, Similarity.PqSubDim, Similarity.PqCodewords
  ) ++ Salts).mkString("g:", ",", "")

  /** Source DATA-file listing as (line, absolute path) pairs, one line
    * per file: `name:size:mtime`. Marker/hidden files (`_SUCCESS`,
    * `.crc`) are excluded — they carry no rows, and the append path
    * must never hand one to a parquet read.
    */
  private def listing(dir: String): Seq[(String, String)] = {
    val src = Paths.get(dir, "embeddings.parquet")
    val files: Seq[Path] =
      if (Files.isDirectory(src)) {
        val st = Files.list(src)
        try st.iterator().asScala.toSeq
          .filter { p =>
            val n = p.getFileName.toString
            !n.startsWith("_") && !n.startsWith(".")
          }
          .sortBy(_.getFileName.toString)
        finally st.close()
      } else if (Files.exists(src)) Seq(src)
      else Seq.empty
    files.map { p =>
      (s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}",
        p.toAbsolutePath.toString)
    }
  }

  /** md5 of the source listing — cheap (no data read), catches both
    * rewrites and regenerations — plus the trainer [[geometry]].
    */
  private def fingerprint(dir: String): String =
    MessageDigest.getInstance("MD5")
      .digest((geometry +: listing(dir).map(_._1)).mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def committedFingerprint(root: Path): Option[String] = {
    val f = root.resolve("_fingerprint")
    if (Files.exists(f)) Some(Files.readString(f).trim) else None
  }

  /** Build the index iff absent or stale; returns the index root. The
    * fast path is a directory listing + pointer reads — safe to call
    * from every query invocation.
    */
  def ensure(s: SparkSession, dir: String): Path = synchronized {
    val root = rootFor(dir)
    val fp = fingerprint(dir)
    def fresh: Boolean =
      committedFingerprint(root).contains(fp) &&
        allTables.forall(t => ParquetIO.currentVersion(root.resolve(t).toString).isDefined)
    if (fresh) return root

    Files.createDirectories(root)
    val lock = root.resolve("_build.lock")
    val acquired =
      try { Files.createFile(lock); true }
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        // another process is building: wait for it, steal if stale
        val deadline = System.currentTimeMillis() + LockTimeoutMs
        var won = false
        while (!won && Files.exists(lock) &&
            System.currentTimeMillis() < deadline) {
          Thread.sleep(200)
          if (fresh) return root // winner committed while we waited
        }
        try { Files.deleteIfExists(lock); Files.createFile(lock); won = true }
        catch { case _: java.nio.file.FileAlreadyExistsException => }
        won
      }
    try {
      if (fresh) return root // re-check under the lock
      // the append decision reads the OLD manifest — before the marker
      // surgery below
      val delta = incrementalDelta(root, dir)
      // stale marker off FIRST: a crash below leaves no committed claim
      Files.deleteIfExists(root.resolve("_fingerprint"))
      delta match {
        case Some(newFiles) => appendBuild(s, root, newFiles)
        case None           => build(s, dir, root)
      }
      def writeAtomic(name: String, content: String): Unit = {
        val tmp = root.resolve(s"$name.tmp")
        Files.writeString(tmp, content)
        Files.move(tmp, root.resolve(name),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
      // manifest before fingerprint: the fingerprint IS the commit
      // marker (written LAST), so a crash between the two re-runs the
      // whole decision next time
      writeAtomic("_manifest", (geometry +: listing(dir).map(_._1)).mkString("\n"))
      writeAtomic("_fingerprint", fp)
    } finally if (acquired) Files.deleteIfExists(lock)
    root
  }

  /** Append-only source growth detection: the committed manifest (same
    * geometry, every old data file byte-identical by name:size:mtime)
    * must be a STRICT subset of the current listing — then the new
    * files' vectors can join the index against the FROZEN codebooks
    * (the standard IVF add-after-train contract) instead of a rebuild.
    * Anything else — a changed old file, a geometry/algorithm change, a
    * missing table — falls back to the full build.
    */
  private def incrementalDelta(root: Path, dir: String): Option[Seq[String]] = {
    val mf = root.resolve("_manifest")
    if (!Files.exists(mf)) return None
    val old = Files.readString(mf).split("\n", -1).toSeq
    if (old.headOption != Some(geometry)) return None
    val oldSet = old.drop(1).filter(_.nonEmpty).toSet
    val cur = listing(dir)
    val curSet = cur.map(_._1).toSet
    val tablesIntact =
      allTables.forall(t => ParquetIO.currentVersion(root.resolve(t).toString).isDefined)
    if (tablesIntact && oldSet.nonEmpty && oldSet.subsetOf(curSet) &&
        curSet.size > oldSet.size)
      Some(cur.filterNot(c => oldSet.contains(c._1)).map(_._2))
    else None
  }

  /** The incremental arm of the index job: route ONLY the new files'
    * vectors against the FROZEN committed codebooks and append their
    * cells/codes. Each append commits as a fresh hard-linked version
    * ([[ParquetIO.appendAsVersion]]) — crash-invisible, O(delta) I/O —
    * and an anti-join on vec_id makes a retried append (crash after
    * tables, before the fingerprint) idempotent instead of
    * row-duplicating.
    */
  private def appendBuild(s: SparkSession, root: Path, newFiles: Seq[String]): Unit = {
    import s.implicits._
    val e = s.read.parquet(newFiles: _*)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", Similarity.norm($"v"))
      .repartition(s.sparkContext.defaultParallelism)
      .persist()
    try {
      for (salt <- Salts) {
        val cellsDir = root.resolve(s"cells_$salt").toString
        val cb = ParquetIO.read(s, root.resolve(s"codebook_$salt").toString)
        val wc = Window.partitionBy($"vec_id")
          .orderBy($"csim".desc, $"centroid_id".asc)
        val cells = e.crossJoin(broadcast(cb))
          .select($"vec_id", $"centroid_id",
            round(Similarity.dot($"v", $"cv") / ($"nrm" * $"cnrm"), 6).as("csim"))
          .withColumn("rn", row_number().over(wc))
          .filter($"rn" <= MaxProbes)
          .select($"vec_id", $"centroid_id".as("cell"), $"rn")
        val existing = ParquetIO.read(s, cellsDir).select($"vec_id").distinct()
        ParquetIO.appendAsVersion(
          cells.join(existing, Seq("vec_id"), "left_anti"), cellsDir)
      }
      val codesDir = root.resolve("pq_codes").toString
      val codes = Similarity.assignPqCodes(s, e.select($"vec_id", $"v"),
        ParquetIO.read(s, root.resolve("pq_codebook").toString))
      val existing = ParquetIO.read(s, codesDir).select($"vec_id").distinct()
      ParquetIO.appendAsVersion(
        codes.join(existing, Seq("vec_id"), "left_anti"), codesDir)
    } finally e.unpersist(false)
  }

  /** The one expensive pass: train both codebooks, route the corpus to
    * its top-[[MaxProbes]] cells per salt, assign PQ codes. Each table
    * commits atomically via the versioned pointer.
    */
  private def build(s: SparkSession, dir: String, root: Path): Unit = {
    import s.implicits._
    val e = Tables.loadSpread(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", Similarity.norm($"v"))
      .persist()
    try {
      for (salt <- Salts) {
        val cb = Similarity.ivfCodebook(s, dir, salt)
        ParquetIO.overwriteSwap(
          cb.select($"centroid_id", $"cv", $"cnrm"),
          root.resolve(s"codebook_$salt").toString)
        val wc = Window.partitionBy($"vec_id")
          .orderBy($"csim".desc, $"centroid_id".asc)
        val cells = e.crossJoin(broadcast(cb))
          .select($"vec_id", $"centroid_id",
            round(Similarity.dot($"v", $"cv") / ($"nrm" * $"cnrm"), 6).as("csim"))
          .withColumn("rn", row_number().over(wc))
          .filter($"rn" <= MaxProbes)
          .select($"vec_id", $"centroid_id".as("cell"), $"rn")
        ParquetIO.overwriteSwap(cells, root.resolve(s"cells_$salt").toString)
      }
      ParquetIO.overwriteSwap(Similarity.trainPqCodebookFlat(s, dir),
        root.resolve("pq_codebook").toString)
      ParquetIO.overwriteSwap(Similarity.trainPqCodes(s, dir),
        root.resolve("pq_codes").toString)
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
