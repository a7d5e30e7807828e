package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

/** The §2.9 SCD2 mutation matrix: new / newer-timestamp / unchanged /
  * hard-delete, plus the invariants (≤1 open version per key, valid_from
  * monotone, timestamp strategy versions even on identical values).
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def batch(rows: (String, String, String)*) =
    rows.toSeq.toDF("key", "value", "lu")
      .withColumn("last_updated", $"lu".cast("timestamp")).drop("lu")

  test("first run opens every row") {
    val h = Scd2.firstRun(batch(("k1", "a", "2024-01-01 00:00:00")), Seq("key"), "last_updated")
    val r = h.collect()
    assert(r.length == 1)
    val row = h.select($"dbt_valid_from", $"dbt_valid_to", $"dbt_updated_at").first()
    assert(row.get(0) == ts("2024-01-01 00:00:00"))
    assert(row.isNullAt(1))
  }

  test("matrix: newer version, unchanged no-op, new key, hard delete") {
    val run1 = Scd2.firstRun(batch(
      ("changed", "v1", "2024-01-01 00:00:00"),
      ("unchanged", "v1", "2024-01-01 00:00:00"),
      ("deleted", "v1", "2024-01-01 00:00:00")), Seq("key"), "last_updated")
    val run2 = Scd2.snapshot(run1, batch(
      ("changed", "v2", "2024-02-01 00:00:00"),
      ("unchanged", "v1", "2024-01-01 00:00:00"), // same updated_at -> no-op
      ("brandnew", "v1", "2024-02-01 00:00:00")),
      Seq("key"), "last_updated", asOf = lit("2024-02-15 00:00:00").cast("timestamp"))

    val rows = run2.orderBy($"key", $"dbt_valid_from")
      .select($"key", $"value", $"dbt_valid_from", $"dbt_valid_to").collect()
    val byKey = rows.groupBy(_.getString(0))

    // changed: old closed at new updated_at, new open
    val ch = byKey("changed").sortBy(_.getTimestamp(2).getTime)
    assert(ch.length == 2)
    assert(ch(0).getTimestamp(3) == ts("2024-02-01 00:00:00"))
    assert(ch(1).isNullAt(3) && ch(1).getString(1) == "v2")

    // unchanged: single open row, untouched
    assert(byKey("unchanged").length == 1 && byKey("unchanged").head.isNullAt(3))

    // hard delete: closed at asOf
    assert(byKey("deleted").length == 1 &&
      byKey("deleted").head.getTimestamp(3) == ts("2024-02-15 00:00:00"))

    // brand new: open
    assert(byKey("brandnew").length == 1 && byKey("brandnew").head.isNullAt(3))
  }

  test("timestamp strategy versions identical values with newer updated_at") {
    val run1 = Scd2.firstRun(batch(("k", "same", "2024-01-01 00:00:00")), Seq("key"), "last_updated")
    val run2 = Scd2.snapshot(run1, batch(("k", "same", "2024-03-01 00:00:00")),
      Seq("key"), "last_updated", asOf = lit("2024-03-02 00:00:00").cast("timestamp"))
    assert(run2.count() == 2) // NOT deduped on value — reproduce, don't fix
    assert(run2.filter($"dbt_valid_to".isNull).count() == 1)
  }

  test("invariants over three runs: <=1 open per key, scd_id unique") {
    val r1 = Scd2.firstRun(batch(("k", "a", "2024-01-01 00:00:00")), Seq("key"), "last_updated")
    val r2 = Scd2.snapshot(r1, batch(("k", "b", "2024-02-01 00:00:00")),
      Seq("key"), "last_updated", lit("2024-02-01 00:00:00").cast("timestamp"))
    val r3 = Scd2.snapshot(r2, batch(("k", "c", "2024-03-01 00:00:00")),
      Seq("key"), "last_updated", lit("2024-03-01 00:00:00").cast("timestamp"))
    assert(r3.count() == 3)
    assert(r3.filter($"dbt_valid_to".isNull).count() == 1)
    assert(r3.select($"dbt_scd_id").distinct().count() == 3)
    // closed intervals non-overlapping: valid_to(n) == valid_from(n+1)
    val ordered = r3.orderBy($"dbt_valid_from").collect()
    val vf = r3.orderBy($"dbt_valid_from").select($"dbt_valid_from").collect().map(_.getTimestamp(0))
    val vt = r3.orderBy($"dbt_valid_from").select($"dbt_valid_to").collect().map(r => if (r.isNullAt(0)) null else r.getTimestamp(0))
    assert(vt(0) == vf(1) && vt(1) == vf(2) && vt(2) == null)
  }
}
