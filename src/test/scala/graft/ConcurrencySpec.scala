package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.ParquetIO

/** The optimistic multi-writer commit protocol (ParquetIO CAS paths):
  * the claim-by-atomic-rename serialization, pointer-independent commit
  * visibility, serializable read-modify-write under real racing
  * threads, and the compaction maintenance rewrite.
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpTable(tag: String): String =
    Files.createTempDirectory(s"graft-occ-$tag").resolve("t").toString

  /** Run bodies on real threads; rethrow the first failure. */
  private def race(bodies: Seq[() => Unit]): Unit = {
    val err = new AtomicReference[Throwable]()
    val ts = bodies.map(b => new Thread(() =>
      try b() catch { case t: Throwable => err.compareAndSet(null, t) }))
    ts.foreach(_.start()); ts.foreach(_.join())
    if (err.get() != null) throw err.get()
  }

  test("overwriteConcurrent: racing blind writers — one complete dataset wins, none lost mid-commit") {
    val dir = tmpTable("blind")
    val writers = 4
    race((1 to writers).map { w => () =>
      ParquetIO.overwriteConcurrent(
        Seq.tabulate(10)(i => (w, i)).toDF("writer", "i"), dir)
    })
    val rows = ParquetIO.read(spark, dir).collect()
    assert(rows.length == 10, "the committed version must be one writer's FULL dataset")
    assert(rows.map(_.getInt(0)).distinct.length == 1,
      "a committed version can never mix two writers' files")
    // every writer claimed a distinct version; last claim is the one read
    assert(ParquetIO.resolveVersion(dir).contains(writers.toLong))
  }

  test("CAS commit stays visible when the pointer cache is stale or gone") {
    val dir = tmpTable("pointer")
    ParquetIO.overwriteConcurrent(Seq(1, 2, 3).toDF("v"), dir)
    Files.deleteIfExists(Paths.get(dir, "_current")) // worst-case stale cache
    assert(ParquetIO.resolveVersion(dir).contains(1L),
      "resolve must recover the committed version from the marker alone")
    assert(ParquetIO.read(spark, dir).count() == 3)
    // and the next commit heals the pointer
    ParquetIO.overwriteConcurrent(Seq(9).toDF("v"), dir)
    assert(ParquetIO.currentVersion(dir).contains(2L))
  }

  test("transformConcurrent: racing increments serialize — no lost updates") {
    val dir = tmpTable("rmw")
    val writers = 3
    val perWriter = 4
    race((1 to writers).map { _ => () =>
      (1 to perWriter).foreach { _ =>
        ParquetIO.transformConcurrent(spark, dir, maxAttempts = 60) {
          case None       => Seq(1L).toDF("n")
          case Some(base) => base.select(($"n" + 1L).as("n"))
        }
      }
    })
    val n = ParquetIO.read(spark, dir).as[Long].head()
    assert(n == writers * perWriter,
      s"every increment must survive some serial order: got $n, " +
        s"want ${writers * perWriter}")
    assert(ParquetIO.resolveVersion(dir).contains((writers * perWriter).toLong))
  }

  test("transformConcurrent: commutative keyed upserts from rival writers all land") {
    val dir = tmpTable("upsert")
    race((0 until 3).map { r => () =>
      val slice = Seq.tabulate(20)(i => (i, s"w$r"))
        .filter(_._1 % 3 == r).toDF("k", "src")
      ParquetIO.transformConcurrent(spark, dir, maxAttempts = 60) {
        case None       => slice
        case Some(base) => base.join(slice, Seq("k"), "left_anti").unionByName(slice)
      }
    })
    val out = ParquetIO.read(spark, dir).orderBy("k").collect()
    assert(out.length == 20, "disjoint upserts must union under any interleaving")
    assert(out.forall(row => row.getInt(0) % 3 == row.getString(1).drop(1).toInt))
  }

  test("legacy lock-serialized commits and CAS commits interleave through one resolve") {
    val dir = tmpTable("mixed")
    ParquetIO.overwriteSwap(Seq(1).toDF("v"), dir) // pointer commit, v1
    val v2 = ParquetIO.transformConcurrent(spark, dir) {
      case Some(base) => base.union(Seq(2).toDF("v")); case None => fail("base missing")
    }
    assert(v2 == 2L)
    ParquetIO.overwriteSwap(Seq(7, 8).toDF("v"), dir) // locked writer sees the CAS commit as base
    assert(ParquetIO.resolveVersion(dir).contains(3L))
    assert(ParquetIO.read(spark, dir).count() == 2)
  }

  test("compact: bin-packs small files, preserves content, no-ops when within budget") {
    val dir = tmpTable("compact")
    val df = spark.range(0, 2000).select($"id", md5($"id".cast("string")).as("h"))
    ParquetIO.overwriteConcurrent(df.repartition(32), dir)
    val before = ParquetIO.read(spark, dir).orderBy("id").collect()

    val stats = ParquetIO.compact(spark, dir, targetBytes = 1L << 20)
    assert(stats.versionAfter == stats.versionBefore + 1)
    assert(stats.filesAfter < stats.filesBefore,
      s"32 shards must pack down: $stats")
    assert(stats.filesAfter <= math.max(1,
      math.ceil(stats.bytesBefore.toDouble / (1L << 20)).toInt))
    val after = ParquetIO.read(spark, dir).orderBy("id").collect()
    assert(after.sameElements(before), "compaction must be content-identical")

    val noop = ParquetIO.compact(spark, dir, targetBytes = 1L << 20)
    assert(noop.versionAfter == noop.versionBefore &&
      noop.filesAfter == stats.filesAfter, s"second pass must no-op: $noop")
  }

  test("clustered compact: disjoint per-file key ranges, content preserved") {
    val dir = tmpTable("cluster")
    // shuffled ids so the incoming layout has NO locality to inherit
    val df = spark.range(0, 4000)
      .select($"id", md5($"id".cast("string")).as("h"))
      .repartition(16, $"h")
    ParquetIO.overwriteConcurrent(df, dir)
    val before = ParquetIO.read(spark, dir).orderBy("id").collect()

    val stats = ParquetIO.compact(spark, dir,
      targetBytes = ParquetIO.tableBytes(dir) / 4, clusterBy = Seq("id"))
    assert(stats.filesAfter > 1, s"want multiple clustered files: $stats")
    val after = ParquetIO.read(spark, dir).orderBy("id").collect()
    assert(after.sameElements(before), "clustered compaction must be content-identical")

    // every output file owns a disjoint id range (the data-skipping
    // property parquet footer stats then serve)
    val ranges = ParquetIO.read(spark, dir)
      .select($"id", input_file_name().as("f"))
      .groupBy($"f").agg(min($"id").as("lo"), max($"id").as("hi"))
      .orderBy($"lo").collect()
    assert(ranges.length == stats.filesAfter)
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) < b.getLong(1),
          s"file ranges overlap: ${a.mkString(",")} vs ${b.mkString(",")}")
      case _ => ()
    }
  }

  test("compact races a concurrent writer without clobbering its commit") {
    val dir = tmpTable("compact-race")
    ParquetIO.overwriteConcurrent(
      spark.range(0, 500).toDF("id").repartition(16), dir)
    race(Seq(
      () => { ParquetIO.compact(spark, dir, targetBytes = 1L << 20); () },
      () => {
        ParquetIO.transformConcurrent(spark, dir, maxAttempts = 60) {
          case Some(base) => base.unionByName(Seq(9999L).toDF("id"))
          case None       => Seq(9999L).toDF("id")
        }
        ()
      }))
    val ids = ParquetIO.read(spark, dir).as[Long].collect().toSet
    assert(ids.contains(9999L), "the writer's row must survive a racing compaction")
    assert(ids.size == 501, "compaction must not duplicate or drop rows")
  }
}
