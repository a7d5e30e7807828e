package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-pointer parquet table IO shared by the batch orchestrator
  * and the streaming upsert sink (SURVEY.md §2.1 S6/S7).
  *
  * Layout: `dir/_current` (one line: the committed version N) plus
  * immutable `dir/v<N>/` parquet directories. A write lands in a FRESH
  * `v<N+1>` directory and commits by atomically renaming a pointer tmp
  * file onto `_current` — the rename IS the transaction. Compared to the
  * earlier delete-then-move swap (whose destructive window needed a
  * `.swap-pending` marker and a recover() pass), this protocol has NO
  * destructive window at all:
  *
  *  - a crash before the pointer flip leaves an uncommitted `v<N+1>`
  *    remnant that no reader can see; the next write clears and rewrites
  *    it — nothing to recover;
  *  - a reader that resolved `_current` reads an immutable directory the
  *    writer never touches again, so a swap running CONCURRENTLY with
  *    reads is safe (gcOldVersions retains the previous version, so even
  *    a reader that resolved just before the flip finishes its scan);
  *  - the streaming MERGE's self-referencing read (read v<N>, write
  *    v<N+1>) no longer needs a tmp-sibling materialization — source and
  *    destination are different directories by construction.
  *
  * Version history doubles as cheap time travel (readVersion) until GC
  * trims it. Single-writer by design: true multi-writer atomicity would
  * need a lock service or a transactional table format, which the
  * offline jar set can't ship. What IS shipped is a best-effort guard —
  * every commit path holds `dir/_writer.lock` (atomic create-new), so a
  * second concurrent writer FAILS FAST with a clear error instead of
  * silently racing the pointer; a lock older than [[LockStaleMs]] is
  * treated as a crashed writer's remnant and stolen.
  */
object ParquetIO {

  /** A `_writer.lock` whose owner pid cannot be verified dead is still
    * presumed abandoned past this age and stolen by the next commit —
    * the fallback for pid-unreadable locks (partially-written file,
    * foreign host).
    */
  val LockStaleMs = 600000L

  /** Atomically materialize `lock` ALREADY CARRYING a fresh `pid:nonce`
    * ownership token, or return None if it exists. The token is written
    * to a uniquely-named sibling first and hard-LINKED into place
    * (create-new semantics + content in one atomic step), so a crash can
    * never leave a token-less lock that blocks every later writer for
    * the full [[LockStaleMs]] despite its holder being dead. Filesystems
    * without hard links fall back to create-new + write (token-less
    * window shrinks to two syscalls; the age heuristic still bounds it).
    */
  private[graft] def tryLockFile(lock: Path): Option[String] = {
    val token = s"${ProcessHandle.current().pid()}:${System.nanoTime()}"
    val tmp = lock.resolveSibling(
      s"${lock.getFileName}.${token.replace(':', '_')}.tmp")
    Files.writeString(tmp, token)
    try { Files.createLink(lock, tmp); Some(token) }
    catch {
      case _: java.nio.file.FileAlreadyExistsException => None
      case _: UnsupportedOperationException | _: java.io.IOException =>
        try { Files.createFile(lock); Files.writeString(lock, token); Some(token) }
        catch { case _: java.nio.file.FileAlreadyExistsException => None }
    } finally Files.deleteIfExists(tmp)
  }

  /** True iff the lock's recorded owner pid is verifiably dead on THIS
    * host. Unreadable/foreign owners report false — callers fall back
    * to the [[LockStaleMs]] age heuristic via [[lockAgeMs]].
    */
  private[graft] def lockOwnerDead(lock: Path): Boolean =
    try {
      val pid = Files.readString(lock).trim.split(":")(0).toLong
      val oh = ProcessHandle.of(pid)
      !(oh.isPresent && oh.get().isAlive)
    } catch { case _: Exception => false }

  /** Age of the lock file; 0 (treat as live) if it vanished mid-check. */
  private[graft] def lockAgeMs(lock: Path): Long =
    try System.currentTimeMillis() - Files.getLastModifiedTime(lock).toMillis
    catch { case _: java.io.IOException => 0L }

  /** Delete the lock only if it still carries OUR token — a stealer's
    * lock is never clobbered by the writer it stole from.
    */
  private[graft] def releaseLockIfMine(lock: Path, token: String): Unit = {
    val mine = try Files.readString(lock).trim == token
               catch { case _: Exception => false }
    if (mine) Files.deleteIfExists(lock)
  }

  /** Serialize commits on `dir`: atomic token-carrying create of
    * `_writer.lock` ([[tryLockFile]]), fail-fast (not wait) on a LIVE
    * concurrent holder — the caller is violating the single-writer
    * contract and should know immediately. A lock whose recorded pid is
    * verifiably dead is a crashed writer's remnant and is stolen AT
    * ONCE (restoring the protocol's zero-wait crash recovery); an
    * unreadable-owner lock falls back to the [[LockStaleMs]] age
    * heuristic. Release deletes the lock only if it still carries OUR
    * token ([[releaseLockIfMine]]).
    */
  private def withWriterLock[T](dir: String)(body: => T): T = {
    Files.createDirectories(Paths.get(dir))
    val lock = Paths.get(dir, "_writer.lock")
    def acquire(retrySteal: Boolean): String =
      tryLockFile(lock).getOrElse {
        val age = lockAgeMs(lock)
        if (retrySteal && (lockOwnerDead(lock) || age > LockStaleMs)) {
          Files.deleteIfExists(lock)
          acquire(retrySteal = false) // a racing stealer wins cleanly: we fail fast
        } else throw new IllegalStateException(
          s"concurrent writer on $dir: _writer.lock held (age ${age} ms) — " +
            "the versioned-pointer protocol is single-writer; serialize commits")
      }
    val token = acquire(retrySteal = true)
    try body finally releaseLockIfMine(lock, token)
  }

  /** How many PREVIOUS committed versions survive GC (in addition to the
    * current one). 1 = an in-flight reader that resolved the pointer
    * just before a flip can still finish; bump for longer time travel.
    */
  val GcRetain = 1

  private def currentFile(dir: String): Path = Paths.get(dir, "_current")

  def versionPath(dir: String, v: Long): String =
    Paths.get(dir, s"v$v").toString

  /** The committed version, if the table exists. */
  def currentVersion(dir: String): Option[Long] =
    if (Files.exists(currentFile(dir)))
      Some(Files.readString(currentFile(dir)).trim.toLong)
    else None

  def exists(dir: String): Boolean =
    currentVersion(dir).isDefined ||
      Files.exists(Paths.get(dir, "_SUCCESS")) // pre-versioning layout

  def read(spark: SparkSession, dir: String): DataFrame =
    currentVersion(dir) match {
      case Some(v) => spark.read.parquet(versionPath(dir, v))
      case None    => spark.read.parquet(dir) // plain/legacy directory
    }

  /** Read a specific retained version — time travel until GC trims it. */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame =
    spark.read.parquet(versionPath(dir, v))

  /** Committed versions currently on disk, ascending. */
  def versionsOnDisk(dir: String): Seq[Long] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val st = Files.list(d)
      try st.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
        .toSeq.sorted
      finally st.close() // a leaked stream per micro-batch exhausts fds
    }
  }

  /** Append-only load into the CURRENT committed version — the RAW
    * layer's contract (later batches add files next to the history,
    * O(batch) per run, never an O(history) rewrite). The version
    * directory stays the pointer's resolve target, so readers see the
    * new batch exactly when the parquet job commits — the same
    * guarantee the flat layout gave appends. First load commits v1.
    */
  def appendInPlace(df: DataFrame, dir: String): Unit = withWriterLock(dir) {
    currentVersion(dir) match {
      case Some(v) => df.write.mode("append").parquet(versionPath(dir, v))
      case None if Files.exists(Paths.get(dir, "_SUCCESS")) =>
        // pre-versioning flat table: append beside the existing files
        // (routing to overwriteSwap here would commit a v1 holding ONLY
        // the new batch and silently hide all prior history from read())
        df.write.mode("append").parquet(dir)
      case None => swapLocked(df, dir) // lock already held — not overwriteSwap
    }
  }

  def overwriteSwap(df: DataFrame, dir: String): Unit =
    withWriterLock(dir) { swapLocked(df, dir) }

  /** CRASH-SAFE append: the batch lands in a FRESH `v<N+1>` directory,
    * the previous version's data files are hard-linked in beside it
    * (O(delta) I/O — links share inodes; copy fallback for filesystems
    * without link support), and the pointer flip commits both at once.
    * Unlike [[appendInPlace]] (which trades crash atomicity for the RAW
    * layer's zero-rewrite contract), a crash mid-append here leaves an
    * uncommitted remnant no reader can see, and the retry rebuilds it
    * cleanly — the same guarantee overwriteSwap gives, at append cost.
    * GC keeps the retained window; shared inodes survive until every
    * linking version is collected.
    */
  def appendAsVersion(df: DataFrame, dir: String): Unit = withWriterLock(dir) {
    currentVersion(dir) match {
      case None => swapLocked(df, dir)
      case Some(v) =>
        val next = v + 1
        val nextP = Paths.get(versionPath(dir, next))
        deleteRecursive(nextP) // a crashed previous attempt is invisible
        df.write.mode("overwrite").parquet(nextP.toString)
        val curP = Paths.get(versionPath(dir, v))
        val st = Files.list(curP)
        try st.iterator().asScala
          .filter { p =>
            val n = p.getFileName.toString
            !n.startsWith("_") && !n.startsWith(".") // data files only
          }
          .foreach { p =>
            val dst = nextP.resolve(s"prev${v}_${p.getFileName}")
            try Files.createLink(dst, p)
            catch { case _: UnsupportedOperationException | _: java.io.IOException =>
              Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
            }
          }
        finally st.close()
        val tmp = Paths.get(dir, "_current.tmp")
        Files.writeString(tmp, next.toString)
        Files.move(tmp, currentFile(dir),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        gcOldVersions(dir, next)
    }
  }

  private def swapLocked(df: DataFrame, dir: String): Unit = {
    val cur = currentVersion(dir)
    val next = cur.getOrElse(0L) + 1
    // an uncommitted remnant of a crashed previous attempt is invisible
    // to readers — clear and rewrite
    deleteRecursive(Paths.get(versionPath(dir, next)))
    df.write.mode("overwrite").parquet(versionPath(dir, next))
    // THE commit: pointer tmp + atomic rename. Readers see cur -> next
    // with no intermediate state.
    val tmp = Paths.get(dir, "_current.tmp")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, currentFile(dir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    gcOldVersions(dir, next)
  }

  /** Drop committed versions older than (current - GcRetain), and any
    * uncommitted directories ABOVE current left by crashed writers of a
    * previous pointer lineage. Never touches current or the retained
    * window, so concurrent readers of those versions are safe.
    */
  private def gcOldVersions(dir: String, current: Long): Unit =
    versionsOnDisk(dir).foreach { v =>
      if (v < current - GcRetain || v > current)
        deleteRecursive(Paths.get(versionPath(dir, v)))
    }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
