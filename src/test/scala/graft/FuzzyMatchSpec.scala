package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.FuzzyMatch

/** Fuzzy company-name reconciliation: the exact-equality core join's
  * known weak point (SURVEY.md §7.4-5). Checks that suffix/punctuation
  * variants of the same company match, unrelated names don't, and the
  * match survives the realistic divergences the landing fixtures carry.
  */
class FuzzyMatchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("normalizeName strips case, punctuation, and legal suffixes") {
    import spark.implicits._
    val got = Seq("Acme Corp.", "ACME Corporation", "acme-corp",
        "Globex Holdings, Inc.", "Wayne Enterprises")
      .toDF("n").select(FuzzyMatch.normalizeName($"n")).collect().map(_.getString(0))
    assert(got(0) == "acme" && got(1) == "acme" && got(2) == "acme")
    assert(got(3) == "globex")
    assert(got(4) == "wayneenterprises")
  }

  test("similarityJoin finds suffix variants, rejects unrelated names") {
    import spark.implicits._
    val fortune = Seq("Acme Corp", "Globex", "Initech", "Stark Industries")
      .toDF("company_name")
    val wiki = Seq("Acme Corporation", "Globex Inc.", "Umbrella",
        "Stark Industries Ltd", "Initech Systems")
      .toDF("company_name")
    val matches = FuzzyMatch.similarityJoin(
        fortune, "company_name", wiki, "company_name", threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(matches.contains(("Acme Corp", "Acme Corporation")))
    assert(matches.contains(("Globex", "Globex Inc.")))
    assert(matches.contains(("Stark Industries", "Stark Industries Ltd")))
    // "Initech" vs "Initech Systems" shares a prefix but diverges: it sits
    // below 0.5 (extra real word, not a legal suffix) - and nothing pairs
    // with Umbrella
    assert(!matches.exists(_._2 == "Umbrella"))
    // no false positives across different companies
    assert(!matches.contains(("Acme Corp", "Globex Inc.")))
    assert(matches.forall { case (l, r) =>
      FuzzyMatch.similarityJoin(Seq(l).toDF("n"), "n", Seq(r).toDF("n"), "n", 0.5)
        .count() == 1
    })
  }

  test("frequency cap keeps stop-grams from driving candidates") {
    import spark.implicits._
    // 20 distinct companies all ending in a shared token that the
    // normalizer does NOT strip ("federal") - with a tight cap their
    // shared grams are excluded and no cross-company pair emerges
    val names = (1 to 20).map(i => s"Zeta$i Federal").toDF("company_name")
    val pairs = FuzzyMatch.similarityJoin(
      names, "company_name", names, "company_name",
      threshold = 0.5, maxGramFreq = 10L)
      .filter($"l_name" =!= $"r_name")
    assert(pairs.count() == 0)
  }
}
