package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.pipeline.ParquetIO

/** The versioned build-once/query-many artifact protocol, factored out
  * of [[AnnIndex]] (round 8) once [[GraphIndex]] and [[LshIndex]] became
  * its second and third instances. One trait owns the whole freshness /
  * locking / incremental-append state machine; an implementation
  * supplies only WHAT to build:
  *
  *  - `listing` — the source data files the artifact derives from
  *    (name:size:mtime lines; the md5 of these + `geometry` is the
  *    freshness fingerprint, so both source changes and algorithm /
  *    knob changes force a rebuild);
  *  - `build` — the full derivation over an exact file snapshot;
  *  - `appendBuild` — the O(delta) arm over only the NEW files
  *    (returning false to demand a full rebuild — drift, one-sided
  *    batches, missing records);
  *  - `allTables` / `geometry` / `storeKind` — shape constants.
  *
  * Shared guarantees (see AnnIndex's scaladoc for the full reasoning,
  * all of which transfers verbatim):
  *
  *  - the fingerprint marker commits LAST, so a crashed build is
  *    invisible and simply re-runs;
  *  - ONE listing snapshot under the lock drives the fingerprint, the
  *    append decision, and the committed manifest;
  *  - one in-process lock (the object monitor) plus a cross-process
  *    `_build.lock` with a pid:nonce ownership token ([[ParquetIO]]'s
  *    writer-lock helpers): steal-if-provably-dead, steal-if-stale,
  *    ERROR on a live holder past `lockTimeoutMs`;
  *  - per-version `_sources` records (committed atomically with the
  *    data by the pointer flip) scope retried appends to exactly the
  *    files a table has not yet landed;
  *  - a concurrent-writer collision inside a build backs off and
  *    retries rather than dying mid-query.
  */
private[graft] trait ArtifactStore {

  /** Short name: keys the default index root (`graft-<kind>-index`),
    * the lock-timeout system property, and error messages.
    */
  protected def storeKind: String

  /** Algorithm + knob fingerprint term — change it and every committed
    * artifact of the old shape invalidates.
    */
  protected def geometry: String

  /** Every table the artifact comprises; freshness requires a committed
    * version of each.
    */
  protected def allTables: Seq[String]

  /** Distinguishes this store's per-source key when several stores
    * share SPARK_GRAFT_INDEX_DIR. AnnIndex predates the trait and keeps
    * its unsuffixed keys.
    */
  protected def keySuffix: String = s"__$storeKind"

  /** Source DATA-file listing as (line, absolute path) pairs — the
    * exact files a build derives from.
    */
  protected def listing(dir: String): Seq[(String, String)]

  /** Extra append-arm preconditions beyond per-table `_sources` records
    * (e.g. AnnIndex's `_drift` yardstick).
    */
  protected def appendRecordsIntact(root: Path): Boolean = true

  /** Tables the append arm grows — these must carry `_sources`. */
  protected def appendTables: Seq[String] = allTables

  /** Full derivation over exactly the snapshot's files. */
  protected def build(s: SparkSession, root: Path, snap: Seq[(String, String)]): Unit

  /** O(delta) arm over only the new files; false = take the rebuild.
    * `snap` is the full current listing the same ensure() decision saw
    * (newFiles ⊆ snap) — for stores whose delta math needs the BASE
    * source bytes too (e.g. [[SuffixIndex]]'s merge reads base text for
    * its comparison windows), not just the committed tables.
    */
  protected def appendBuild(s: SparkSession, root: Path,
      newFiles: Seq[(String, String)], snap: Seq[(String, String)]): Boolean

  /** How long a waiting builder tolerates a holder it cannot prove dead
    * before erroring out. System-property override is for tests.
    */
  def lockTimeoutMs: Long =
    sys.props.get(s"graft.$storeKind.lockTimeoutMs").map(_.toLong)
      .getOrElse(600000L)

  /** Artifacts live OUTSIDE the read-only source directory, keyed by
    * its absolute path: distinct corpora never share an index.
    */
  def indexRoot: String = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
    Paths.get(sys.props("java.io.tmpdir"), s"graft-$storeKind-index").toString)

  private def rootFor(dir: String): Path = {
    val abs = Paths.get(dir).toAbsolutePath.toString
    val key = abs.replaceAll("[^A-Za-z0-9._-]", "_") + keySuffix
    Paths.get(indexRoot, key)
  }

  def tableDir(dir: String, name: String): String =
    rootFor(dir).resolve(name).toString

  /** For harnesses that must clear a stale index so a timed phase
    * measures a real build, not the fast-path listing.
    */
  def indexPathFor(dir: String): Path = rootFor(dir)

  /** One `name:size:mtime` line per data file of `dir/<table>.parquet`
    * (file or directory; markers and hidden files excluded), optionally
    * prefixed — the listing building block implementations compose.
    */
  protected def tableListing(
      dir: String, table: String, prefix: String = ""): Seq[(String, String)] = {
    val src = Paths.get(dir, s"$table.parquet")
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
      (s"$prefix${p.getFileName}:${Files.size(p)}:" +
        s"${Files.getLastModifiedTime(p).toMillis}",
        p.toAbsolutePath.toString)
    }
  }

  private def fingerprintOf(snap: Seq[(String, String)]): String =
    MessageDigest.getInstance("MD5")
      .digest((geometry +: snap.map(_._1)).mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def committedFingerprint(root: Path): Option[String] = {
    val f = root.resolve("_fingerprint")
    if (Files.exists(f)) Some(Files.readString(f).trim) else None
  }

  protected def writeAtomic(root: Path, name: String, content: String): Unit = {
    val tmp = root.resolve(s"$name.tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, root.resolve(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def tablesIntact(root: Path): Boolean =
    allTables.forall(t => ParquetIO.currentVersion(root.resolve(t).toString).isDefined)

  /** Build the artifact iff absent or stale; returns the index root.
    * Fast path = a directory listing + pointer reads — safe to call
    * from every query invocation.
    */
  def ensure(s: SparkSession, dir: String): Path = synchronized {
    val root = rootFor(dir)
    def freshNow: Boolean =
      committedFingerprint(root).contains(fingerprintOf(listing(dir))) &&
        tablesIntact(root)
    if (freshNow) return root

    Files.createDirectories(root)
    val lock = root.resolve("_build.lock")
    val deadline = System.currentTimeMillis() + lockTimeoutMs
    var token: Option[String] = None
    while (token.isEmpty) {
      if (freshNow) return root // winner committed while we waited
      token = ParquetIO.tryLockFile(lock)
      if (token.isEmpty) {
        if (ParquetIO.lockOwnerDead(lock) ||
            ParquetIO.lockAgeMs(lock) > ParquetIO.LockStaleMs)
          Files.deleteIfExists(lock) // crashed builder's remnant: steal, re-loop
        else if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"$storeKind index build on $root: _build.lock held by a live " +
              s"builder past $lockTimeoutMs ms — refusing to steal a live lock; retry later")
        else Thread.sleep(200)
      }
    }
    try {
      var attempt = 0
      while (true) {
        // ONE snapshot under the lock: fingerprint, append decision, and
        // the committed manifest all derive from the same file set
        val snap = listing(dir)
        val fp = fingerprintOf(snap)
        if (committedFingerprint(root).contains(fp) && tablesIntact(root))
          return root
        try {
          // the append decision reads the OLD manifest — before the
          // marker surgery below
          val delta = incrementalDelta(root, snap)
          // stale marker off FIRST: a crash below leaves no committed claim
          Files.deleteIfExists(root.resolve("_fingerprint"))
          val appended = delta.exists(newFiles => appendBuild(s, root, newFiles, snap))
          if (!appended) build(s, root, snap)
          // manifest before fingerprint: the fingerprint IS the commit
          // marker (written LAST), so a crash between the two re-runs the
          // whole decision next time
          writeAtomic(root, "_manifest", (geometry +: snap.map(_._1)).mkString("\n"))
          writeAtomic(root, "_fingerprint", fp)
          return root
        } catch {
          case e: IllegalStateException
              if e.getMessage != null &&
                e.getMessage.contains("concurrent writer") && attempt < 3 =>
            // a stolen-from builder is still flushing its table commits:
            // back off, re-check freshness (loop head), retry the build
            attempt += 1
            Thread.sleep(1000L * attempt)
        }
      }
      root // unreachable — the loop exits only by return/throw
    } finally token.foreach(t => ParquetIO.releaseLockIfMine(lock, t))
  }

  /** Append-only source growth detection: the committed manifest (same
    * geometry, every old data file byte-identical by name:size:mtime)
    * must be a STRICT subset of the current listing snapshot, with all
    * tables intact and every append table carrying a `_sources` record
    * — anything else falls back to the full build.
    */
  private def incrementalDelta(
      root: Path, snap: Seq[(String, String)]): Option[Seq[(String, String)]] = {
    val mf = root.resolve("_manifest")
    if (!Files.exists(mf)) return None
    val old = Files.readString(mf).split("\n", -1).toSeq
    if (old.headOption != Some(geometry)) return None
    val oldSet = old.drop(1).filter(_.nonEmpty).toSet
    val curSet = snap.map(_._1).toSet
    val recordsIntact = tablesIntact(root) && appendRecordsIntact(root) &&
      appendTables.forall(t => appliedSources(root, t).isDefined)
    if (recordsIntact && oldSet.nonEmpty && oldSet.subsetOf(curSet) &&
        curSet.size > oldSet.size)
      Some(snap.filterNot(c => oldSet.contains(c._1)))
    else None
  }

  /** The source-file lines whose rows the table's CURRENT version
    * contains — from the `_sources` file INSIDE the version directory,
    * so the record commits atomically with the data at the pointer
    * flip. None = no record: the caller must full-rebuild, never guess.
    */
  protected def appliedSources(root: Path, table: String): Option[Set[String]] = {
    val dirS = root.resolve(table).toString
    ParquetIO.currentVersion(dirS).flatMap { v =>
      val f = Paths.get(ParquetIO.versionPath(dirS, v), "_sources")
      if (Files.exists(f))
        Some(Files.readString(f).split("\n", -1).filter(_.nonEmpty).toSet)
      else None
    }
  }

  /** Record the applied source set inside the table's current version
    * directory (underscore-prefixed: invisible to parquet scans). A
    * crash between a commit and its record leaves a sources-less
    * version, which [[incrementalDelta]] refuses to append onto — the
    * failure mode is a redundant rebuild, never duplicated rows.
    */
  protected def writeSources(root: Path, table: String, lines: Set[String]): Unit = {
    val dirS = root.resolve(table).toString
    val v = ParquetIO.currentVersion(dirS).getOrElse(sys.error(
      s"writeSources: $table has no committed version"))
    Files.writeString(Paths.get(ParquetIO.versionPath(dirS, v), "_sources"),
      lines.toSeq.sorted.mkString("\n"))
  }
}
