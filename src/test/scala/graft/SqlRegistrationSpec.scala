package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NativeExpressions

/** The custom expressions are callable from plain SQL after
  * FunctionRegistry registration — the extension surface a spark.sql
  * user (or a SparkSessionExtensions injector) consumes.
  */
class SqlRegistrationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("native expressions callable from spark.sql") {
    NativeExpressions.registerAll(spark)
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("docs_sql")
    val row = spark.sql(
      """SELECT doc_id,
        |  word_shingles(text, 3) AS shs,
        |  simhash32(split(text, ' ')) AS sh32,
        |  minhash_signature(word_shingles(text, 3), 8) AS sig
        |FROM docs_sql WHERE doc_id = 0""".stripMargin).first()
    assert(row.getSeq[String](1).nonEmpty)
    assert(row.getSeq[String](3).length == 8)
    // identical to the Column-API path
    val viaApi = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") === 0)
      .select(NativeExpressions.simhash32(split(col("text"), " "))).first().getLong(0)
    assert(row.getLong(2) == viaApi)
  }
}
