package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnIndex
import graft.pipeline.ParquetIO

/** Locks the materialized-index lifecycle the ANN family depends on:
  * build-once (ensure is idempotent on a fresh index), staleness on
  * SOURCE change (a regenerated corpus at the same path forces a
  * rebuild), crash recovery (a missing fingerprint marker — the marker
  * is written LAST — rebuilds everything), and the probe-depth read
  * contract. Uses a private temp COPY of the sf0.001 corpus so mtime
  * surgery never touches the shared read-only testdata, and gets its
  * own index subtree (the index is keyed by absolute corpus path).
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("ensure: build-once, fast-path, source-staleness, crash recovery") {
    val corpus = Files.createTempDirectory("annix-corpus").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/embeddings.parquet"),
      Paths.get(corpus, "embeddings.parquet"))

    val root = AnnIndex.ensure(spark, corpus)
    val cellsDir = AnnIndex.tableDir(corpus, "cells_b")
    val v1 = ParquetIO.currentVersion(cellsDir)
    assert(v1.isDefined, "first ensure must commit the cells table")
    assert(Files.exists(root.resolve("_fingerprint")))

    // fast path: a second ensure with an unchanged source commits nothing
    AnnIndex.ensure(spark, corpus)
    assert(ParquetIO.currentVersion(cellsDir) == v1,
      "unchanged source must fast-path, not rebuild")

    // a regenerated corpus at the same path (same bytes, new mtime — the
    // driver's per-round regeneration shape) must force a full rebuild
    Files.setLastModifiedTime(Paths.get(corpus, "embeddings.parquet"),
      FileTime.fromMillis(System.currentTimeMillis() + 5000))
    AnnIndex.ensure(spark, corpus)
    val v2 = ParquetIO.currentVersion(cellsDir)
    assert(v2 != v1, "source mtime change must rebuild the index")

    // crashed build: the fingerprint marker is written LAST, so its
    // absence (with intact tables) means rebuild-everything
    Files.delete(root.resolve("_fingerprint"))
    AnnIndex.ensure(spark, corpus)
    assert(Files.exists(root.resolve("_fingerprint")),
      "recovery must recommit the marker")
    assert(ParquetIO.currentVersion(cellsDir) != v2,
      "a markerless index must be treated as crashed and rebuilt")
  }

  test("incremental append: frozen codebooks, O(delta) routing, idempotent retry") {
    import spark.implicits._
    val corpus = Files.createTempDirectory("annix-inc").toString
    val srcDir = Paths.get(corpus, "embeddings.parquet")
    // stage the corpus as a DIRECTORY of per-half files (the layout
    // incremental ingestion produces): half A first, half B later
    val all = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def stage(half: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val tmp = Files.createTempDirectory(s"annix-half$tag").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val st = Files.list(Paths.get(tmp))
      val part =
        try st.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally st.close()
      Files.createDirectories(srcDir)
      Files.copy(part, srcDir.resolve(s"part-$tag.parquet"))
    }
    stage(all.filter($"vec_id" < 25), "a")
    val root = AnnIndex.ensure(spark, corpus)
    val cbDir = AnnIndex.tableDir(corpus, "codebook_b")
    val cellsDir = AnnIndex.tableDir(corpus, "cells_b")
    val cbV1 = ParquetIO.currentVersion(cbDir)
    val nCellsA = ParquetIO.read(spark, cellsDir).count()
    val manifestA = Files.readString(root.resolve("_manifest"))

    stage(all.filter($"vec_id" >= 25), "b")
    AnnIndex.ensure(spark, corpus)
    // codebook FROZEN (no new version), cells grown to cover both halves
    assert(ParquetIO.currentVersion(cbDir) == cbV1,
      "append must not retrain/recommit the codebook")
    val cells = ParquetIO.read(spark, cellsDir)
    assert(cells.count() > nCellsA, "delta vectors must join the index")
    val allVecs = all.count()
    assert(cells.select("vec_id").distinct().count() == allVecs,
      "every vector (base + delta) must be routed")
    // crash retry: simulate dying AFTER the append's table commits but
    // BEFORE the manifest/fingerprint landed — the re-run takes the
    // incremental arm again and must re-append idempotently, never
    // duplicate rows. The per-version _sources record makes this
    // O(delta): the retry sees every delta file already applied and
    // commits NOTHING (no new version), where the old full-index
    // anti-join re-read the index to append an empty batch.
    val cellsVAfterAppend = ParquetIO.currentVersion(cellsDir)
    Files.writeString(root.resolve("_manifest"), manifestA)
    Files.deleteIfExists(root.resolve("_fingerprint"))
    AnnIndex.ensure(spark, corpus)
    assert(ParquetIO.currentVersion(cbDir) == cbV1,
      "crash retry must stay on the incremental arm (frozen codebook)")
    assert(ParquetIO.currentVersion(cellsDir) == cellsVAfterAppend,
      "a fully-applied retry must commit no new version")
    val cells2 = ParquetIO.read(spark, cellsDir)
    assert(cells2.count() == cells2.select("vec_id", "rn").distinct().count(),
      "retried append duplicated (vec_id, rn) rows")
    assert(cells2.select("vec_id").distinct().count() == allVecs)
    // PQ codes cover the full corpus too
    assert(ParquetIO.read(spark, AnnIndex.tableDir(corpus, "pq_codes"))
      .select("vec_id").distinct().count() == allVecs)
    // the applied-source record rides inside the committed version
    val vNow = ParquetIO.currentVersion(cellsDir).get
    assert(Files.exists(Paths.get(
      ParquetIO.versionPath(cellsDir, vNow), "_sources")),
      "current cells version must carry its _sources record")
    assert(Files.exists(root.resolve("_drift")),
      "build must persist the base drift stats")
  }

  test("drift gauge: shifted delta forces retrain, in-distribution delta appends") {
    import spark.implicits._
    val corpus = Files.createTempDirectory("annix-drift").toString
    val srcDir = Paths.get(corpus, "embeddings.parquet")
    val all = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def stage(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val tmp = Files.createTempDirectory(s"annix-drift$tag").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val st = Files.list(Paths.get(tmp))
      val part =
        try st.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally st.close()
      Files.createDirectories(srcDir)
      Files.copy(part, srcDir.resolve(s"part-$tag.parquet"))
    }
    // CLUSTERED base: 6 centers (real corpus vectors) × 10 members each,
    // members perturbed by a tiny j-scaled all-ones shift — nearest-
    // centroid cosine stays ≈1, so the base quantization-error stats
    // (_drift) are TIGHT. The test data's own vectors are ~uniform on
    // the sphere (zero-mean), where junk is statistically
    // indistinguishable from signal — a clustered base is what gives
    // the gauge something to defend.
    def members(jOff: Int) =
      all.filter($"vec_id" < 6)
        .crossJoin(spark.range(10).toDF("j"))
        .select(($"vec_id" * 100 + $"j" + jOff).as("vec_id"),
          transform($"embedding",
            x => x + lit(0.002f) * $"j".cast("float")).as("embedding"),
          $"label")
    stage(members(0), "base")
    AnnIndex.ensure(spark, corpus)
    val cbDir = AnnIndex.tableDir(corpus, "codebook_b")
    val cbV1 = ParquetIO.currentVersion(cbDir)
    assert(cbV1.isDefined)

    // in-distribution growth: members of the SAME clusters, fresh ids —
    // appends against the frozen codebook (no codebook recommit)
    stage(members(10), "indist")
    AnnIndex.ensure(spark, corpus)
    assert(ParquetIO.currentVersion(cbDir) == cbV1,
      "in-distribution delta must append, not retrain")

    // adversarial shift: vectors from elsewhere on the sphere, nearly
    // orthogonal to every trained centroid — the delta's mean
    // quantization error (≈0.7+) blows past the tight base p95 and the
    // append arm must fall back to a full retrain
    stage(all.filter($"vec_id" >= 100 && $"vec_id" < 140)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding", $"label"), "shift")
    AnnIndex.ensure(spark, corpus)
    assert(ParquetIO.currentVersion(cbDir) != cbV1,
      "a drifted delta must trigger a full retrain, not a frozen append")
    // and the rebuild covers everything, including the shifted batch
    val n = Tables.load(spark, corpus, "embeddings").count()
    assert(ParquetIO.read(spark, AnnIndex.tableDir(corpus, "cells_b"))
      .select("vec_id").distinct().count() == n)
  }

  test("build lock: dead owner stolen at once; live owner never stolen, release-only-if-mine") {
    import spark.implicits._
    val corpus = Files.createTempDirectory("annix-lock").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/embeddings.parquet"),
      Paths.get(corpus, "embeddings.parquet"))
    // pre-plant a crashed builder's lock: pid 999999999 is verifiably
    // absent, so ensure must steal IMMEDIATELY (no 10-minute age wait)
    // and build
    val root = Paths.get(AnnIndex.indexRoot,
      Paths.get(corpus).toAbsolutePath.toString.replaceAll("[^A-Za-z0-9._-]", "_"))
    Files.createDirectories(root)
    val lock = root.resolve("_build.lock")
    Files.writeString(lock, "999999999:dead")
    val t0 = System.currentTimeMillis()
    AnnIndex.ensure(spark, corpus)
    assert(System.currentTimeMillis() - t0 < 300000,
      "dead-owner lock must be stolen immediately, not aged out")
    assert(!Files.exists(lock), "our own lock must be released after the build")
    val cellsDir = AnnIndex.tableDir(corpus, "cells_b")
    assert(ParquetIO.currentVersion(cellsDir).isDefined)

    // a LIVE holder (this very pid, foreign nonce) must never be stolen:
    // past the (test-shortened) timeout ensure errors out with the lock
    // intact — no unlocked fall-through build, no foreign-lock deletion
    val foreign = s"${ProcessHandle.current().pid()}:not-ours"
    Files.writeString(lock, foreign)
    // make the index stale so ensure actually wants to build
    Files.setLastModifiedTime(Paths.get(corpus, "embeddings.parquet"),
      FileTime.fromMillis(System.currentTimeMillis() + 7000))
    val v1 = ParquetIO.currentVersion(cellsDir)
    sys.props("graft.ann.lockTimeoutMs") = "1200"
    try {
      val e = intercept[IllegalStateException] {
        AnnIndex.ensure(spark, corpus)
      }
      assert(e.getMessage.contains("live builder"))
    } finally sys.props.remove("graft.ann.lockTimeoutMs")
    assert(Files.readString(lock) == foreign,
      "a live holder's lock must survive untouched (no steal, no release)")
    assert(ParquetIO.currentVersion(cellsDir) == v1,
      "no commit may happen without holding the build lock")
    Files.delete(lock)

    // two same-process racers: exactly one build, both return fresh
    val threads = (1 to 2).map { _ =>
      new Thread(() => AnnIndex.ensure(spark, corpus))
    }
    threads.foreach(_.start()); threads.foreach(_.join(600000))
    assert(ParquetIO.currentVersion(cellsDir).exists(_ >= 1))
    assert(!Files.exists(lock))
  }

  test("cells: probe depth is a pushed filter within the materialized range") {
    val dir = "/root/testdata/sf0.001"
    intercept[IllegalArgumentException] {
      AnnIndex.cells(spark, dir, "b", AnnIndex.MaxProbes + 1)
    }
    val one = AnnIndex.cells(spark, dir, "b", 1)
    assert(one.agg(max("rn")).head().getInt(0) == 1,
      "probe-1 read must carry only rank-1 assignments")
    val all = AnnIndex.cells(spark, dir, "b", AnnIndex.MaxProbes)
    assert(all.count() > one.count(),
      "deeper probe reads must surface strictly more assignments")
  }
}
