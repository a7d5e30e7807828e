package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** Unit semantics of the as-of join: inclusive match, carry of the
  * LATEST prior row, no-match nulls, and — the subtle one — no row
  * tearing when a newer right row carries a NULL payload column.
  */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join: inclusive latest-prior match with nulls for no-match") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-10 00:00:00")),
      (1L, ts("2024-01-20 00:00:00")),
      (2L, ts("2024-01-05 00:00:00"))).toDF("k", "lt")
    val right = Seq(
      (1L, ts("2024-01-10 00:00:00"), "a"), // equal ts -> matches (inclusive)
      (1L, ts("2024-01-15 00:00:00"), "b"),
      (2L, ts("2024-01-06 00:00:00"), "late")) // after left -> no match
      .toDF("rk", "rt", "v")
    val got = AsOf.join(left, right, "k", "rk", "lt", "rt")
      .orderBy($"k", $"lt").collect()
    assert(got(0).getString(got(0).fieldIndex("v")) == "a") // inclusive
    assert(got(1).getString(got(1).fieldIndex("v")) == "b") // latest prior
    assert(got(2).isNullAt(got(2).fieldIndex("v"))) // nothing prior
  }

  test("as-of join: NULL column in the newest right row does not tear") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-20 00:00:00"))).toDF("k", "lt")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), Some("old"), Some(10L)),
      (1L, ts("2024-01-15 00:00:00"), None: Option[String], Some(20L)))
      .toDF("rk", "rt", "v", "n")
    val row = AsOf.join(left, right, "k", "rk", "lt", "rt").first()
    // the whole newest row must be carried: v NULL (not "old"), n = 20
    assert(row.isNullAt(row.fieldIndex("v")))
    assert(row.getLong(row.fieldIndex("n")) == 20L)
  }
}
