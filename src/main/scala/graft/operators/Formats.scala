package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftQuery, Tables}

/** Interchange-format round-trips (round 9, batch 22): the engine's
  * source surface beyond parquet. A lake ingests CSV and JSONL long
  * before anything becomes columnar, and the round-trip operator —
  * write with full fidelity, read back under an EXPLICIT schema —
  * is how the format layer gets tested in production (schema drift,
  * quoting, header handling, float text round-trips).
  *
  * Oracle strategy: the oracle must not read scratch files (the gate
  * runs DuckDB against the registered parquet tables only), so each
  * query PROVES the round-trip by emitting a content checksum of the
  * read-back rows over a canonical string form — the q117 device,
  * widened from the key column to EVERY column. The oracle computes
  * the same checksum from the parquet table directly: any corruption
  * the format layer introduces (lost precision, broken quoting, a
  * swallowed row) breaks the hash match.
  */
object Formats {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Scratch dir unique per input dir so concurrent gates can't clash. */
  private def scratch(dir: String, tag: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft-formats/$tag-$h"
  }

  private def hashAgg(canon: org.apache.spark.sql.Column) = Seq(
    count(lit(1)).as("n_rows"),
    sum(conv(substring(md5(canon), 1, 8), 16, 10).cast("long"))
      .as("content_checksum"))

  /** q288: CSV ROUND-TRIP under an explicit schema — header on, every
    * column canonicalized to text (money as DECIMAL(18,2) strings so
    * the float never leaves exact form), written with Spark's CSV
    * sink, read back with a DECLARED schema (never inferSchema — the
    * production contract), and checksummed. Shortest-repr double text
    * would also round-trip, but the decimal canon keeps the oracle
    * engine-neutral.
    */
  def q288CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch(dir, "csv-customer")
    t(s, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_nationkey",
        $"c_acctbal".cast(DecimalType(18, 2)).cast("string")
          .as("c_acctbal"),
        $"c_mktsegment")
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", StringType),
      StructField("c_mktsegment", StringType)))
    val back = s.read.schema(schema).option("header", "true").csv(out)
    val canon = concat_ws("|", $"c_custkey", $"c_name", $"c_nationkey",
      $"c_acctbal", $"c_mktsegment")
    back.agg(hashAgg(canon).head, hashAgg(canon).tail: _*)
      .select(lit("customer_csv").as("roundtrip"), $"n_rows",
        $"content_checksum")
  }

  private val q288Sql =
    """SELECT 'customer_csv' AS roundtrip,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(('0x' || substr(md5(
      |    CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||
      |    CAST(c_nationkey AS VARCHAR) || '|' ||
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
      |    c_mktsegment), 1, 8))::BIGINT) AS BIGINT) AS content_checksum
      |FROM customer""".stripMargin

  /** q289: JSONL ROUND-TRIP — the other half of the landing-zone
    * surface (the reference's raw layer is JSON: `DAG:24–29` lands
    * API/scrape payloads as JSON documents). Orders go out as JSON
    * lines (timestamps canonicalized to 'yyyy-MM-dd HH:mm:ss' text —
    * the cross-dialect-safe form), come back under a declared schema,
    * and the checksum covers every column including the re-parsed
    * timestamp.
    */
  def q289JsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch(dir, "jsonl-orders")
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice".cast(DecimalType(18, 2)).cast("string")
          .as("o_totalprice"),
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss")
          .as("o_orderdate"),
        $"o_orderpriority")
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", StringType),
      StructField("o_orderdate", StringType),
      StructField("o_orderpriority", StringType)))
    val back = s.read.schema(schema).json(out)
    val canon = concat_ws("|", $"o_orderkey", $"o_custkey",
      $"o_orderstatus", $"o_totalprice", $"o_orderdate",
      $"o_orderpriority")
    back.agg(hashAgg(canon).head, hashAgg(canon).tail: _*)
      .select(lit("orders_jsonl").as("roundtrip"), $"n_rows",
        $"content_checksum")
  }

  private val q289Sql =
    """SELECT 'orders_jsonl' AS roundtrip,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(('0x' || substr(md5(
      |    CAST(o_orderkey AS VARCHAR) || '|' ||
      |    CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
      |    strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' ||
      |    o_orderpriority), 1, 8))::BIGINT) AS BIGINT)
      |    AS content_checksum
      |FROM orders""".stripMargin

  /** q296: ORC ROUND-TRIP — the third Spark-native columnar format,
    * exercised with NATIVE types end to end (CSV/JSONL canonicalize
    * through text; ORC must carry long/int/decimal/timestamp as typed
    * columns and give them back bit-exact). Lineitem goes out with
    * money pre-cast to DECIMAL(18,2) (the q288 exactness discipline —
    * the decimal is a typed ORC column here, not a string), comes back
    * under a declared schema, and the all-column checksum — including
    * the timestamp re-rendered canonically — must match the oracle's
    * recomputation from the parquet source. Scan-shaped both ways.
    */
  def q296OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch(dir, "orc-lineitem")
    t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        $"l_quantity".cast(DecimalType(18, 2)).as("l_quantity"),
        $"l_extendedprice".cast(DecimalType(18, 2)).as("l_extendedprice"),
        $"l_returnflag", $"l_shipdate")
      .write.mode("overwrite").orc(out)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DecimalType(18, 2)),
      StructField("l_extendedprice", DecimalType(18, 2)),
      StructField("l_returnflag", StringType),
      StructField("l_shipdate", TimestampNTZType)))
    val back = s.read.schema(schema).orc(out)
    val canon = concat_ws("|", $"l_orderkey", $"l_linenumber",
      $"l_quantity".cast("string"), $"l_extendedprice".cast("string"),
      $"l_returnflag",
      date_format($"l_shipdate", "yyyy-MM-dd HH:mm:ss"))
    back.agg(hashAgg(canon).head, hashAgg(canon).tail: _*)
      .select(lit("lineitem_orc").as("roundtrip"), $"n_rows",
        $"content_checksum")
  }

  private val q296Sql =
    """SELECT 'lineitem_orc' AS roundtrip,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(('0x' || substr(md5(
      |    CAST(l_orderkey AS VARCHAR) || '|' ||
      |    CAST(l_linenumber AS VARCHAR) || '|' ||
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
      |    l_returnflag || '|' ||
      |    strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')), 1, 8))::BIGINT)
      |    AS BIGINT) AS content_checksum
      |FROM lineitem""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q296_orc_roundtrip", Seq("S4", "F9", "A2"),
      "ORC write/read round-trip with NATIVE typed columns (long/int/decimal/timestamp), all-column checksum oracle",
      q296OrcRoundtrip, Some(q296Sql)),
    GraftQuery("q288_csv_roundtrip", Seq("S4", "F9", "A2"),
      "CSV write/read round-trip under a declared schema, proven by an all-column content checksum against the parquet source",
      q288CsvRoundtrip, Some(q288Sql)),
    GraftQuery("q289_jsonl_roundtrip", Seq("S4", "F1", "A2"),
      "JSONL write/read round-trip (the reference's raw-layer format), canonical timestamps, all-column checksum oracle",
      q289JsonlRoundtrip, Some(q289Sql)))
}
