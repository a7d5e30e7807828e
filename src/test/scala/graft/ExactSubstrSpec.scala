package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q290 (ExactSubstr maximal-span dedup): every
  * reported span is (a) genuinely shared — the two documents' token
  * slices are byte-identical, (b) at least the minimum length, and
  * (c) maximal within its diagonal — runs on the same (doc_a, doc_b,
  * pos_a − pos_b) diagonal never touch (a touching or overlapping run
  * would have been one run by construction). Token-level maximality
  * beyond the anchor index holds except where the df-cap truncated an
  * edge anchor, so the token check asserts the non-extensible case for
  * every span whose edge anchors survived the cap — on this corpus
  * that is all of them (also asserted, so a corpus change that starts
  * capping edges fails loudly instead of silently weakening the test).
  */
class ExactSubstrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q290 spans are shared verbatim, >= min length, and diagonal-maximal") {
    import spark.implicits._
    val L = operators.Dedup.ExactSubstrMinLen
    val spans = operators.Dedup.q290ExactSubstring(spark, dir).collect()
    assert(spans.nonEmpty, "the test corpus is known to contain shared spans")
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    spans.foreach { r =>
      val (da, db) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (as0, bs0) = (r.getAs[Long]("a_start").toInt, r.getAs[Long]("b_start").toInt)
      val len = r.getAs[Long]("span_len").toInt
      assert(len >= L)
      val (ta, tb) = (toks(da), toks(db))
      val sa = ta.slice(as0 - 1, as0 - 1 + len)
      val sb = tb.slice(bs0 - 1, bs0 - 1 + len)
      assert(sa == sb, s"span not shared verbatim: ($da,$db) @($as0,$bs0)+$len")
      assert(r.getAs[String]("span") == sa.mkString(" "))
      // token-level maximality: extension on either side must fail
      val leftOk = as0 == 1 || bs0 == 1 || ta(as0 - 2) != tb(bs0 - 2)
      val rightOk = as0 - 1 + len >= ta.size || bs0 - 1 + len >= tb.size ||
        ta(as0 - 1 + len) != tb(bs0 - 1 + len)
      assert(leftOk, s"span extendable left: ($da,$db) @($as0,$bs0)+$len")
      assert(rightOk, s"span extendable right: ($da,$db) @($as0,$bs0)+$len")
    }
    // diagonal-maximality: runs on one diagonal never touch
    spans.groupBy(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("a_start") - r.getAs[Long]("b_start")))
      .foreach { case (_, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("a_start"))
        sorted.sliding(2).foreach {
          case Array(x, y) =>
            assert(x.getAs[Long]("a_start") + x.getAs[Long]("span_len") <
              y.getAs[Long]("a_start"), "touching runs on one diagonal")
          case _ => ()
        }
      }
  }

  /** q304's invariants against a brute-force replay of the removal rule:
    * (1) token-mass conservation per doc; (2) the kept text is EXACTLY
    * the original minus the b-side-covered positions (no resurrection,
    * no over-trim); (3) first-occurrence retention: every span's kept
    * canonical (doc_a) copy survives whenever no OTHER span's removal
    * overlaps it — and at least one such clean retention exists.
    */
  test("q304 trim conserves token mass, removes exactly the b-side cover, keeps first occurrences") {
    import spark.implicits._
    val out = operators.Dedup.q304ExactSubstrTrim(spark, dir).collect()
    val spans = operators.Dedup.q290ExactSubstring(spark, dir).collect()
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    // brute-force removal sets from the span list
    val removed = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    spans.foreach { r =>
      val db = r.getAs[Long]("doc_b")
      val bs = r.getAs[Long]("b_start")
      removed(db) = removed(db) ++ (bs until bs + r.getAs[Long]("span_len"))
    }
    assert(removed.nonEmpty)
    var trimmedDocs = 0
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = toks(id)
      val rm = removed(id)
      assert(r.getAs[Long]("n_tokens") == t.size)
      assert(r.getAs[Long]("removed_tokens") == rm.size,
        s"doc $id: removal set mismatch")
      assert(r.getAs[Long]("removed_tokens") + r.getAs[Long]("kept_tokens") ==
        r.getAs[Long]("n_tokens"), s"doc $id: token mass not conserved")
      val keptText = t.zipWithIndex
        .collect { case (tok, i) if !rm.contains(i + 1L) => tok }
        .mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(keptText.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("kept_hash") == md, s"doc $id: kept text differs")
      if (rm.nonEmpty) trimmedDocs += 1
    }
    assert(trimmedDocs > 0, "corpus must contain trimmed documents")
    // first-occurrence retention where no other span interferes
    val cleanRetentions = spans.count { r =>
      val da = r.getAs[Long]("doc_a")
      val as0 = r.getAs[Long]("a_start")
      val range = (as0 until as0 + r.getAs[Long]("span_len")).toSet
      range.intersect(removed(da)).isEmpty // canonical copy untouched
    }
    assert(cleanRetentions > 0,
      "expected at least one span whose canonical copy survives intact")
  }
}
