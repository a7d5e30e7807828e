package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

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
