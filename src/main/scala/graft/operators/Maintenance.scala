package graft.operators

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.pipeline.ParquetIO

/** Lakehouse maintenance + multi-writer operators: the table-management
  * layer the reference delegates to Snowflake (transactional MERGE from
  * concurrent dbt runs; micro-partition compaction behind OPTIMIZE /
  * automatic clustering — dbt_project.yml:38-56 relies on both without
  * naming them). Re-expressed for plain parquet via [[ParquetIO]]'s
  * optimistic CAS commit protocol: version claims by atomic directory
  * rename, marker-based commit visibility, rebase-on-conflict
  * read-modify-write, and bin-packing compaction committed as a new
  * version.
  *
  * Both queries are REAL concurrency runs, not simulations: q168 races
  * three OS threads through `transformConcurrent` on one table. The
  * oracle can still carry them because the merged content is chosen to
  * be COMMUTATIVE — disjoint-key upserts union to the same table under
  * every interleaving, so any serializable protocol produces exactly
  * the oracle's answer, and any lost update / torn commit breaks the
  * hash.
  */
object Maintenance {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** q168: concurrent MERGE — three writers race keyed upserts of
    * disjoint customer residue classes into ONE versioned table through
    * [[ParquetIO.transformConcurrent]] (claim-exactly-base+1 CAS;
    * losing writers rebase on the winner's commit). The final table
    * must hold every slice intact regardless of commit order — the
    * multi-pipeline ingestion shape (three sources landing into one
    * dimension) that the lock-serialized paths fail fast on. At 100 TB
    * each writer's work is one anti-join + union shuffled on the key
    * (broadcast for small batches under AQE); the commit itself is
    * O(1) renames.
    */
  def q168ConcurrentMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val target = Files.createTempDirectory("graft-q168").resolve("cust").toString
    val summary = t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        graft.functions.Fns.exactSum2($"o_totalprice").as("total_spend"),
        max($"o_orderdate").as("last_order"))
    val err = new AtomicReference[Throwable]()
    val writers = (0 until 3).map { r =>
      new Thread(() =>
        try {
          val slice = summary.filter($"o_custkey" % 3 === r)
          ParquetIO.transformConcurrent(s, target, maxAttempts = 60) {
            case None       => slice
            case Some(base) =>
              base.join(slice, Seq("o_custkey"), "left_anti").unionByName(slice)
          }
        } catch { case e: Throwable => err.compareAndSet(null, e) })
    }
    writers.foreach(_.start()); writers.foreach(_.join())
    if (err.get() != null) throw err.get()
    val out = ParquetIO.read(s, target).orderBy($"o_custkey")
    // materialize (bounded: one row per customer) before the temp table
    // is deleted — the q125 harness hygiene, not an operator pattern
    val rows = out.collect()
    rmTree(java.nio.file.Paths.get(target).getParent)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  private val q168Sql =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
      |  max(o_orderdate) AS last_order
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** q169: small-file compaction — land `documents` as 48 micro-batch
    * shards (the streaming-sink pathology), bin-pack them with
    * [[ParquetIO.compact]] into ⌈bytes/target⌉ files committed as a new
    * version, and emit the read-back table's order-free content
    * checksum beside the file-count verdicts. The oracle computes the
    * same checksum from the ORIGINAL table — a compaction that drops,
    * duplicates, or corrupts any row breaks the hash, and one that
    * fails to reduce the file count breaks the `files_reduced` literal.
    * (File counts themselves aren't visible to SQL; CompactionSpec in
    * ConcurrencySpec pins the exact bin-packing arithmetic.)
    */
  def q169Compaction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-q169").resolve("docs").toString
    ParquetIO.overwriteConcurrent(
      t(s, dir, "documents").repartition(48), tmp)
    val filesBefore = ParquetIO.tableFileCount(tmp)
    val stats = ParquetIO.compact(s, tmp,
      targetBytes = math.max(256L << 10, ParquetIO.tableBytes(tmp) / 4))
    val out = ParquetIO.read(s, tmp)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(conv(substring(md5(concat_ws("|",
          $"doc_id".cast("string"), md5($"text"))), 1, 8), 16, 10)
          .cast("long")).as("content_checksum"))
      .select($"n_docs", $"content_checksum",
        lit(filesBefore == 48 && stats.filesAfter < stats.filesBefore)
          .as("files_reduced"))
    val rows = out.collect() // 1 row; frees the temp table for deletion
    rmTree(java.nio.file.Paths.get(tmp).getParent)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  private def rmTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))

  /** q181: merge-on-read deletes — at 100 TB a DELETE that rewrites a
    * 1 GB file to drop 3 rows is the copy-on-write death spiral, so
    * [[ParquetIO.deleteWhere]] commits positional deletion vectors
    * (version, file_name, row_index from the parquet `_metadata`
    * columns) and [[ParquetIO.readMoR]] subtracts them with one
    * broadcast anti-join. Two overlapping predicates accumulate
    * vectors against a 12-shard `documents` table; the query PROVES no
    * data file was touched (the version's file listing is captured
    * before and after and compared into the `no_rewrite` literal) and
    * emits the surviving content checksum — the oracle computes the
    * same from `documents` with the predicates inverted, so a vector
    * that misses, double-drops, or mis-indexes any row breaks the
    * hash.
    */
  def q181DeleteVectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-q181").resolve("docs").toString
    ParquetIO.overwriteConcurrent(
      t(s, dir, "documents").repartition(12), tmp)
    def dataFiles: Set[String] = {
      val v = ParquetIO.resolveVersion(tmp).get
      val st = Files.list(java.nio.file.Paths.get(ParquetIO.versionPath(tmp, v)))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
      } finally st.close()
    }
    val before = dataFiles
    val n1 = ParquetIO.deleteWhere(s, tmp, $"doc_id" % 7 === 0)
    val n2 = ParquetIO.deleteWhere(s, tmp, $"doc_id" % 11 === 3) // overlaps %77=...
    val untouched = dataFiles == before
    val ratio = ParquetIO.deleteRatio(s, tmp)
    val out = ParquetIO.readMoR(s, tmp)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(conv(substring(md5(concat_ws("|",
          $"doc_id".cast("string"), md5($"text"))), 1, 8), 16, 10)
          .cast("long")).as("content_checksum"))
      .select($"n_docs", $"content_checksum",
        lit(untouched && n1 > 0 && n2 > 0 && ratio > 0).as("no_rewrite"))
    val rows = out.collect()
    rmTree(java.nio.file.Paths.get(tmp).getParent)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** q182: merge-on-read UPSERT — the O(batch) MERGE
    * ([[ParquetIO.upsertMoR]]): two overlapping keyed batches land
    * against a sharded customer dimension; matched keys' positions
    * become deletion vectors, batch rows append as new files, and the
    * composition rule (newest image wins — the second batch's key scan
    * covers the first batch's appended files) plus inserts are all
    * exercised. The query proves no pre-existing data file was removed
    * or replaced (the before-listing must be a SUBSET of the after-
    * listing: merge-on-read only ADDS files) and hash-checks the
    * logical content — count, exact DECIMAL balance total, and the
    * insert count — against an oracle that computes the final image
    * per key with a CASE. A full-rewrite MERGE of the same batches
    * would re-write the whole table; here write volume is O(batch).
    */
  def q182UpsertMoR(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-q182").resolve("cust").toString
    val base = t(s, dir, "customer")
      .select($"c_custkey".as("k"), $"c_mktsegment".as("segment"),
        $"c_acctbal".as("bal"))
    ParquetIO.overwriteConcurrent(base.repartition(8), tmp)
    def files: Set[String] = {
      val v = ParquetIO.resolveVersion(tmp).get
      val st = Files.list(java.nio.file.Paths.get(ParquetIO.versionPath(tmp, v)))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
      } finally st.close()
    }
    val before = files
    val batch1 = base.filter($"k" % 10 === 0)
      .select($"k", $"segment", ($"bal" + 1000d).as("bal"))
      .unionByName(base.filter($"k" % 50 === 0)
        .select(($"k" + 2000000L).as("k"), lit("NEWSEG").as("segment"),
          lit(123.45).as("bal")))
    val batch2 = base.filter($"k" % 4 === 0)
      .select($"k", $"segment", ($"bal" - 500d).as("bal"))
    ParquetIO.upsertMoR(s, tmp, batch1, Seq("k"))
    ParquetIO.upsertMoR(s, tmp, batch2, Seq("k"))
    val onlyAdded = before.subsetOf(files)
    val out = ParquetIO.readMoR(s, tmp)
      .agg(
        count(lit(1)).as("n_rows"),
        sum($"bal".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_bal"),
        sum(when($"k" >= 2000000L, 1L).otherwise(0L)).as("n_inserted"))
      .select($"n_rows", $"total_bal", $"n_inserted",
        lit(onlyAdded).as("no_rewrite"))
    val rows = out.collect()
    rmTree(java.nio.file.Paths.get(tmp).getParent)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  private val q182Sql =
    """WITH fin AS (
      |  SELECT c_custkey AS k,
      |    CASE WHEN c_custkey % 4 = 0 THEN c_acctbal - 500
      |         WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000
      |         ELSE c_acctbal END AS bal
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey + 2000000, 123.45 FROM customer WHERE c_custkey % 50 = 0)
      |SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
      |  CAST(sum(CASE WHEN k >= 2000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
      |  TRUE AS no_rewrite
      |FROM fin""".stripMargin

  /** q183: right-to-be-forgotten purge — [[ParquetIO.purgeWhere]]
    * records deletion vectors for the matching keys in EVERY retained
    * version, so one O(matches) operation hides them from the current
    * read AND from vector-subtracted time travel, with no version
    * rewritten. Two committed states keep v1 in the GC retain window;
    * the `forgotten_everywhere` literal folds the governance proof:
    * the purged class is absent from the v1 time-travel read, history()
    * shows vectors bound to BOTH versions, and no data file changed.
    * The oracle computes the surviving current content directly.
    */
  def q183Purge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-q183").resolve("cust").toString
    val base = t(s, dir, "customer")
      .select($"c_custkey".as("k"), $"c_mktsegment".as("segment"),
        $"c_acctbal".as("bal"))
    ParquetIO.overwriteSwap(base.repartition(4), tmp) // v1
    ParquetIO.overwriteSwap(base.repartition(4)
      .select($"k", $"segment",
        when($"k" % 2 === 0, $"bal" + 7d).otherwise($"bal").as("bal")),
      tmp) // v2; v1 retained
    def files: Set[String] = {
      val v = ParquetIO.resolveVersion(tmp).get
      val st = Files.list(java.nio.file.Paths.get(ParquetIO.versionPath(tmp, v)))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
      } finally st.close()
    }
    val before = files
    val n = ParquetIO.purgeWhere(s, tmp, $"k" % 13 === 0)
    val ttClean = ParquetIO.readVersionMoR(s, tmp, 1L)
      .filter($"k" % 13 === 0).count() == 0
    val hist = ParquetIO.history(s, tmp)
    val histOk = hist.size == 2 && hist.forall(_.delete_vectors > 0) &&
      hist.count(_.is_current) == 1
    val out = ParquetIO.readMoR(s, tmp)
      .agg(
        count(lit(1)).as("n_rows"),
        sum($"bal".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_bal"))
      .select($"n_rows", $"total_bal",
        lit(n > 0 && ttClean && histOk && files == before)
          .as("forgotten_everywhere"))
    val rows = out.collect()
    rmTree(java.nio.file.Paths.get(tmp).getParent)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  private val q183Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(c_acctbal + CASE WHEN c_custkey % 2 = 0 THEN 7 ELSE 0 END
      |    AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
      |  TRUE AS forgotten_everywhere
      |FROM customer WHERE c_custkey % 13 <> 0""".stripMargin

  private val q181Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || md5(text)), 1, 8))::BIGINT)
      |    AS BIGINT) AS content_checksum,
      |  TRUE AS no_rewrite
      |FROM documents
      |WHERE doc_id % 7 <> 0 AND doc_id % 11 <> 3""".stripMargin

  private val q169Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || md5(text)), 1, 8))::BIGINT)
      |    AS BIGINT) AS content_checksum,
      |  TRUE AS files_reduced
      |FROM documents""".stripMargin

  /** q251: CRYPTO-SHREDDING — the third right-to-be-forgotten
    * mechanism, completing q183 (deletion vectors) and q49
    * (pseudonymization): PII is stored ONLY encrypted, each subject
    * under their own key in a small key table; "delete" is dropping the
    * key row — O(1), no fact rewrite, no retained-version sweep,
    * time-travel-proof by construction (every historical copy of the
    * ciphertext is dead the instant the key is). Spark-side the crypto
    * is REAL (builtin `aes_encrypt`/`try_aes_decrypt`, 128-bit per-user
    * keys derived deterministically, ECB so the round trip is
    * reproducible); the read path is a broadcast key join +
    * decrypt-or-NULL. The oracle checks the SEMANTICS (shredded
    * subjects unreadable, everyone else byte-identical, row set
    * unchanged) — which is exactly what a compliance audit checks.
    */
  def q251CryptoShred(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
    // per-subject 128-bit key (16 bytes = 32 md5 hex chars)
    val keys = cust.select($"c_custkey",
      substring(md5(concat(lit("key:"), $"c_custkey")), 1, 32).as("k"))
    val vault = cust
      .join(keys, Seq("c_custkey"))
      .select($"c_custkey",
        base64(aes_encrypt($"c_name".cast("binary"),
          unhex($"k"), lit("ECB"))).as("enc_name"),
        $"c_nationkey")
    // the shred: the key table loses every 13th subject — nothing else
    val kept = keys.filter($"c_custkey" % 13 =!= 0)
    vault.join(broadcast(kept), Seq("c_custkey"), "left")
      .select($"c_custkey",
        try_aes_decrypt(unbase64($"enc_name"), unhex($"k"), lit("ECB"))
          .cast("string").as("recovered_name"),
        $"k".isNull.as("shredded"),
        $"c_nationkey")
      .orderBy($"c_custkey")
  }

  private val q251Sql =
    """SELECT c_custkey,
      |  CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_name END
      |    AS recovered_name,
      |  c_custkey % 13 = 0 AS shredded,
      |  c_nationkey
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q251_crypto_shred", Seq("EXT-anonymize", "EXT-occ", "J1"),
      "crypto-shredding: per-subject AES keys, delete = drop the key row; decrypt-or-NULL read proves shredded subjects unreadable with zero fact rewrites",
      q251CryptoShred, Some(q251Sql)),
    GraftQuery("q168_concurrent_merge", Seq("S6", "J4", "EXT-occ"),
      "three racing writers MERGE disjoint key slices through the optimistic CAS commit protocol",
      q168ConcurrentMerge, Some(q168Sql)),
    GraftQuery("q169_compaction", Seq("S7", "EXT-occ", "EXT-olap"),
      "small-file bin-packing compaction committed as a new table version, content-preservation oracle-carried",
      q169Compaction, Some(q169Sql)),
    GraftQuery("q181_delete_vectors", Seq("S7", "EXT-occ", "EXT-cdc"),
      "merge-on-read deletes: positional deletion vectors from _metadata columns, broadcast anti-join subtraction, zero data files rewritten",
      q181DeleteVectors, Some(q181Sql)),
    GraftQuery("q182_upsert_mor", Seq("S6", "J4", "EXT-occ", "EXT-cdc"),
      "merge-on-read UPSERT: matched positions become delete vectors, batches append as new files — O(batch) MERGE, newest image wins, files only added",
      q182UpsertMoR, Some(q182Sql)),
    GraftQuery("q183_purge", Seq("S7", "EXT-occ", "EXT-anonymize"),
      "right-to-be-forgotten purge: vectors recorded against every retained version hide the keys from current reads AND time travel, zero rewrites",
      q183Purge, Some(q183Sql)))
}
