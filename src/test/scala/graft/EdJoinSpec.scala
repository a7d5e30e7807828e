package graft

import org.scalatest.funsuite.AnyFunSuite

/** q308 ED-Join locked against an in-memory brute force: the prefix-
  * filtered join must return EXACTLY the pairs a length-filtered
  * all-pairs Levenshtein scan finds (completeness AND soundness —
  * ED-Join's claim is zero missed pairs, not recall), every synthetic
  * twin must surface at exactly τ edits, and the candidate set must be
  * strictly smaller than all-pairs (the filter does real work).
  */
class EdJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Textbook O(nm) Levenshtein — independent of both engines. */
  private def lev(a: String, b: String): Int = {
    val prev = Array.range(0, b.length + 1)
    var cur = new Array[Int](b.length + 1)
    var p = prev
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = p(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(p(j) + 1, cur(j - 1) + 1), sub)
      }
      val t = p; p = cur; cur = t
    }
    p(b.length)
  }

  test("q308 equals the brute-force edit-distance<=2 join; twins found at exactly tau") {
    import spark.implicits._
    val out = operators.Dedup.q308EdJoin(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("lev")))
      .toSet
    // rebuild the universe exactly as the query does
    val base = Tables.load(spark, dir, "documents")
      .select($"doc_id", org.apache.spark.sql.functions.substring($"text", 1, 48))
      .as[(Long, String)].collect()
    val twins = base.filter(_._1 % 10 == 0).map { case (id, k) =>
      val kd = k.substring(0, math.min(4, k.length)) +
        (if (k.length > 5) k.substring(5) else "")
      // mirror the query's SQL exactly: concat(substring(kd,1,19), 'q',
      // substring(kd,21)) — substring past the end is "", so a short kd
      // still gains the 'q' (take/drop are the Scala equivalents; the
      // previous `if (kd.length > 20)` guard left short keys unchanged
      // and would diverge from the query on a short-text corpus)
      val kt = kd.take(19) + "q" + kd.drop(20)
      (id + operators.Dedup.TwinOffset, kt)
    }
    val u = base ++ twins
    val truth = (for {
      i <- u.indices.iterator
      j <- (i + 1) until u.length
      (ia, ka) = u(i)
      (ib, kb) = u(j)
      (la, sa) = if (ia < ib) (ia, ka) else (ib, kb)
      (lb, sb) = if (ia < ib) (ib, kb) else (ia, ka)
      if math.abs(sa.length - sb.length) <= operators.Dedup.EdTau
      d = lev(sa, sb)
      if d <= operators.Dedup.EdTau
    } yield (la, lb, d.toLong)).toSet
    assert(out == truth,
      s"missed=${(truth -- out).take(5)} spurious=${(out -- truth).take(5)}")
    // every twin pair surfaces (the delete+substitute construction is
    // <= tau edits by design — exactly tau unless the substituted char
    // was already 'q' — so candidate generation must never drop one)
    val twinPairs = base.filter(_._1 % 10 == 0)
      .map(t => (t._1, t._1 + operators.Dedup.TwinOffset)).toSet
    twinPairs.foreach { case (a, b) =>
      assert(out.exists(t => t._1 == a && t._2 == b),
        s"twin pair ($a,$b) missing from the join result")
    }
    assert(twinPairs.nonEmpty)
  }
}
