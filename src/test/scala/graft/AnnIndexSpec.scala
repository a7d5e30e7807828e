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
    // duplicate rows
    Files.writeString(root.resolve("_manifest"), manifestA)
    Files.deleteIfExists(root.resolve("_fingerprint"))
    AnnIndex.ensure(spark, corpus)
    assert(ParquetIO.currentVersion(cbDir) == cbV1,
      "crash retry must stay on the incremental arm (frozen codebook)")
    val cells2 = ParquetIO.read(spark, cellsDir)
    assert(cells2.count() == cells2.select("vec_id", "rn").distinct().count(),
      "retried append duplicated (vec_id, rn) rows")
    assert(cells2.select("vec_id").distinct().count() == allVecs)
    // PQ codes cover the full corpus too
    assert(ParquetIO.read(spark, AnnIndex.tableDir(corpus, "pq_codes"))
      .select("vec_id").distinct().count() == allVecs)
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
