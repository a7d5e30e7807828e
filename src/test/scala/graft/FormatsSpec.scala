package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The format round-trips (q288/q289): fidelity against the parquet
  * source, and the negative control — a corrupted read-back must break
  * the checksum, otherwise the oracle device proves nothing.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def sourceChecksum(table: String, canon: org.apache.spark.sql.Column): (Long, Long) = {
    val r = Tables.load(spark, dir, table)
      .agg(count(lit(1)),
        sum(conv(substring(md5(canon), 1, 8), 16, 10).cast("long")))
      .collect().head
    (r.getLong(0), r.getLong(1))
  }

  test("q288: CSV round-trip reproduces the parquet content checksum") {
    import spark.implicits._
    val got = operators.Formats.q288CsvRoundtrip(spark, dir).collect().head
    val canon = concat_ws("|", $"c_custkey", $"c_name", $"c_nationkey",
      $"c_acctbal".cast("decimal(18,2)").cast("string"), $"c_mktsegment")
    val (n, sum0) = sourceChecksum("customer", canon)
    assert(got.getLong(1) == n, "row count drifted through CSV")
    assert(got.getLong(2) == sum0, "content checksum drifted through CSV")
  }

  test("q289: JSONL round-trip reproduces the parquet content checksum") {
    import spark.implicits._
    val got = operators.Formats.q289JsonlRoundtrip(spark, dir).collect().head
    val canon = concat_ws("|", $"o_orderkey", $"o_custkey",
      $"o_orderstatus",
      $"o_totalprice".cast("decimal(18,2)").cast("string"),
      date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss"),
      $"o_orderpriority")
    val (n, sum0) = sourceChecksum("orders", canon)
    assert(got.getLong(1) == n && got.getLong(2) == sum0)
  }

  test("negative control: a corrupted field breaks the checksum") {
    import spark.implicits._
    val canonGood = concat_ws("|", $"c_custkey", $"c_name",
      $"c_nationkey",
      $"c_acctbal".cast("decimal(18,2)").cast("string"), $"c_mktsegment")
    // simulate a format layer that loses one cent on one row
    val corrupted = Tables.load(spark, dir, "customer")
      .withColumn("c_acctbal",
        when($"c_custkey" === 7L, $"c_acctbal" + 0.01)
          .otherwise($"c_acctbal"))
    val bad = corrupted
      .agg(sum(conv(substring(md5(canonGood), 1, 8), 16, 10).cast("long")))
      .collect().head.getLong(0)
    val (_, good) = sourceChecksum("customer", canonGood)
    assert(bad != good, "a one-cent corruption must break the checksum")
  }
}
