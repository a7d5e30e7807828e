package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fns._

/** Parity vectors for the expression "macros" (SURVEY.md §2.7/§2.10):
  * surrogate-key MD5s are hardcoded literals computed independently, so a
  * stringification drift (e.g. int rendering) fails loudly.
  */
class FnsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).first().get(0)

  test("surrogateKey matches dbt_utils.generate_surrogate_key MD5s") {
    assert(one(surrogateKey(lit("Acme Corp"), lit("ACME"))) ==
      "9d295765fe42e4049ca07351b5cec528")
    assert(one(surrogateKey(lit("Acme Corp"), lit("Springfield"), lit("Illinois"))) ==
      "5b973944484fc568543fd4c5242048ec")
    assert(one(surrogateKey(lit("Acme Corp"), lit("acme-corp"))) ==
      "090d87046eb63de60ef744eb2058322c")
  }

  test("surrogateKey null sentinel") {
    assert(one(surrogateKey(lit(null).cast("string"), lit("x"))) ==
      "3b4eefe862272d14394cff0e43854ab0") // md5('_dbt_utils_surrogate_key_null_-x')
  }

  test("surrogateKey int stringification matches varchar cast") {
    // md5('Acme Corp-ACME') built from an int column must differ and be
    // stable: int 7 renders as '7'
    assert(one(surrogateKey(lit(7))) == one(surrogateKey(lit("7"))))
  }

  test("parseMoneyToFloat vectors (macros/parse_numeric.sql)") {
    assert(one(parseMoneyToFloat(lit("$3,200"))) == 3200.0)
    assert(one(parseMoneyToFloat(lit("$483,153.6"))) == 483153.6)
    assert(one(parseMoneyToFloat(lit("-$1.5"))) == -1.5)
    assert(one(parseMoneyToFloat(lit(""))) == null)
    assert(one(parseMoneyToFloat(lit(null).cast("string"))) == null)
  }

  test("yesNoFlag: yes/no/missing -> true/false/false (IFF null-to-else)") {
    assert(one(yesNoFlag(lit("yes"))) == true)
    assert(one(yesNoFlag(lit("no"))) == false)
    assert(one(yesNoFlag(lit(null).cast("string"))) == false)
  }

  test("splitPart: literal delimiter, NULL out-of-range (Snowflake SPLIT)") {
    assert(one(splitPart(lit("Acme Corp (conglomerate)"), " (", 0)) == "Acme Corp")
    assert(one(splitPart(lit("Austin, Texas"), ", ", 1)) == "Texas")
    assert(one(splitPart(lit("Austin"), ", ", 1)) == null)
  }
}
