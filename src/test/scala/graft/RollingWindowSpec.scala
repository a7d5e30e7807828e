package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Extended

/** Semantic invariants for the round-4 window operators (q71-q73) — the
  * properties that must hold at ANY scale factor, checked over the real
  * events table. (Value-level parity with DuckDB is the driver gate;
  * these lock the semantics a refactor could silently break.)
  */
class RollingWindowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q71: rolling counts dominate daily counts and match a 7-day self-join") {
    import spark.implicits._
    val out = Extended.q71RollingFeatures(spark, dir).persist()
    try {
      assert(out.filter($"roll7_events" < $"n_events").count() == 0,
        "trailing frame includes the current day")
      // differential: the RANGE frame must equal an explicit interval
      // self-join aggregation (the naive O(n * window) formulation)
      val a = out.select($"user_id", $"day_num", $"n_events")
      val ref = a.as("x").join(a.as("y"),
          $"x.user_id" === $"y.user_id" &&
            $"y.day_num".between($"x.day_num" - 6, $"x.day_num"))
        .groupBy($"x.user_id".as("user_id"), $"x.day_num".as("day_num"))
        .agg(sum($"y.n_events").as("ref_roll"))
      val diff = out.join(ref, Seq("user_id", "day_num"))
        .filter($"roll7_events" =!= $"ref_roll").count()
      assert(diff == 0)
    } finally { out.unpersist(); () }
  }

  test("q72: deciles partition the table into near-equal, ordered bands") {
    import spark.implicits._
    val out = Extended.q72EquidepthDeciles(spark, dir).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 10))
    val counts = out.map(_.getLong(1))
    assert(counts.max - counts.min <= 1, "equi-depth: sizes differ by at most 1")
    val total = Tables.load(spark, dir, "events").count()
    assert(counts.sum == total)
    // non-overlapping value bands: each decile's hi <= next decile's lo
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2), "decile bands must be ordered")
    case _ => ()
    }
  }

  test("q73: burst sizes account for every event; keepers start their burst") {
    import spark.implicits._
    // sf0.01: dense enough that multi-event bursts exist (sf0.001 has none)
    val d = "/root/testdata/sf0.01"
    val out = Extended.q73BurstDedup(spark, d)
    val kept = out.agg(sum($"burst_n")).head().getLong(0)
    val total = Tables.load(spark, d, "events").count()
    assert(kept == total, "sum of burst sizes must equal the event count")
    // singleton bursts dominate at this density but multi-event bursts
    // must exist, or the 300 s suppression is vacuous
    assert(out.filter($"burst_n" > 1).count() > 0)
  }
}
