package graft

import org.scalatest.funsuite.AnyFunSuite

/** q311 locked against an in-memory suffix sort of the WHOLE pool: the
  * oracle hash-checks a rank sample (head + every 2500th); this spec
  * asserts the complete permutation — every (doc, pos) suffix gets
  * exactly the rank a materialized sort assigns, including the
  * duplicate-suffix groups (cross-document shared tails) whose ties the
  * (doc, pos) break must order identically.
  */
class SuffixRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q311 full permutation equals a materialized suffix sort") {
    import spark.implicits._
    val (fin, _) = operators.Dedup.suffixRanksFull(spark, dir)
    val got = fin.as[(Long, Long, Int)].collect()
      .map { case (rank, doc, pos) => (doc, pos) -> rank }.toMap
    val docs = Tables.load(spark, dir, "documents")
      .filter($"doc_id" % operators.Dedup.SufMod === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val suffixes = docs.flatMap { case (id, t) =>
      (1 to t.length).map(p => (t.substring(p - 1), id, p))
    }
    val sorted = suffixes.sortBy { case (suf, id, p) => (suf, id, p) }
    assert(got.size == sorted.length)
    sorted.zipWithIndex.foreach { case ((_, id, p), i) =>
      assert(got((id, p)) == i + 1L,
        s"suffix (doc=$id, pos=$p) ranked ${got((id, p))}, expected ${i + 1}")
    }
    // non-vacuity: the pool contains duplicate suffixes (shared tails),
    // so the tie-break path is actually exercised
    val dupes = suffixes.groupBy(_._1).count(_._2.length > 1)
    assert(dupes > 0, "no duplicate suffixes — tie-break path untested")
  }
}
