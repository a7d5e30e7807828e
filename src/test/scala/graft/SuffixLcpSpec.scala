package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q315 (suffix-array LCP layer) against brute-force truth: materialize
  * every pool suffix, sort, take adjacent common-prefix lengths, group
  * — the query's banded/survivor-split computation must reproduce it
  * exactly. Plus the anchor-gram cross-check VERDICT r11 asked for:
  * every q290 maximal span between pool docs lower-bounds the LCP
  * layer's global max (the span text is a repeated substring, and the
  * longest repeated substring is always attained at a rank-adjacent
  * pair), while LCP additionally surfaces repeats SHORTER than the
  * 8-token anchor window or not token-aligned — what anchor grams miss.
  */
class SuffixLcpSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Brute-force (doc_a, doc_b, n_adj, max_lcp, sum_lcp) over a pool
    * corpus, survivor threshold = SufBase.
    */
  private def truth(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] = {
    val sufs = for ((id, t) <- docs; p <- 1 to t.length) yield (t.substring(p - 1), id, p)
    val sorted = sufs.sortBy(x => (x._1, x._2, x._3))
    val pairs = sorted.sliding(2).collect { case Seq((sa, da, _), (sb, db, _)) =>
      val lcp = sa.zip(sb).takeWhile { case (x, y) => x == y }.size.toLong
      (math.min(da, db), math.max(da, db), lcp)
    }.toSeq.filter(_._3 >= operators.Dedup.SufBase)
    pairs.groupBy(x => (x._1, x._2)).map { case ((a, b), xs) =>
      (a, b, xs.size.toLong, xs.map(_._3).max, xs.map(_._3).sum)
    }.toSet
  }

  private def q315Set(dir: String): Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    operators.SuffixIndex.q315SuffixLcp(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("q315 equals brute-force adjacent-suffix LCP on a synthetic pool with long repeats") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"block$i").mkString(" ") // ~90 chars
    val innerRep = "zqx" * 15 // 45-char non-token-aligned repeat inside ONE doc
    val docs = Seq(
      (10L, s"alpha beta gamma $shared delta omega"),
      (20L, s"first words here $shared and a tail $innerRep middle $innerRep end"),
      (30L, "completely unrelated text with no long repeats at all in it"),
      (40L, s"prefix $shared")) // repeat ends at doc end (suffix-length tie path)
    val dir = Files.createTempDirectory("lcp-corpus")
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    assert(q315Set(dir.toString) == truth(docs))
  }

  /** Brute-force q323 LCP char cover per doc: sorted suffixes, each
    * suffix's max adjacent LCP (either neighbor, any doc), ranges
    * [p, p + maxadj − 1] unioned.
    */
  private def lcpCoverTruth(docs: Seq[(Long, String)]): Map[Long, Long] = {
    val sufs = for ((id, t) <- docs; p <- 1 to t.length) yield (t.substring(p - 1), id, p)
    val sorted = sufs.sortBy(x => (x._1, x._2, x._3))
    val lcps = sorted.sliding(2).collect { case Seq((sa, _, _), (sb, _, _)) =>
      sa.zip(sb).takeWhile { case (x, y) => x == y }.size
    }.toArray
    val cov = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Int]]()
    for (i <- sorted.indices) {
      val m = math.max(if (i > 0) lcps(i - 1) else 0,
        if (i < lcps.length) lcps(i) else 0)
      if (m >= operators.SuffixIndex.LcpTrimMinSpan) {
        val (_, id, p) = sorted(i)
        val set = cov.getOrElseUpdate(id, scala.collection.mutable.Set[Int]())
        (p until p + m).foreach(set += _)
      }
    }
    docs.map { case (id, _) =>
      id -> cov.get(id).map(_.size.toLong).getOrElse(0L)
    }.toMap
  }

  test("q323: LCP cover equals brute force, contains the anchor cover, and is strictly larger") {
    import spark.implicits._
    // pool docs 10/20 share a 10-token span (anchor-arm-visible:
    // pool-world df = 2); docs 10/30 share a 20-char NON-token-aligned
    // repeat only the suffix structure sees; doc 40 is repeat-free
    val span = (1 to 10).map(i => s"tok$i").mkString(" ")
    val short = "qqwweerrttyyuuiioopp"
    val docs = Seq(
      (10L, s"$span leading ${short}finish here"),
      (20L, s"other start then $span trailing words"),
      (30L, s"unrelated body with ${short}suffix text"),
      (40L, "zebra yak walrus vulture unique content"))
    val dir = Files.createTempDirectory("lcptrim-corpus")
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val out = operators.SuffixIndex.q323LcpTrim(spark, dir.toString)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, nc, lr, ar, ao) => id -> ((nc, lr, ar, ao)) }.toMap
    // containment: no anchor-removed char escapes the LCP cover
    assert(out.values.forall(_._4 == 0L),
      s"anchor_only > 0 somewhere: $out")
    // the anchor arm fires on the shared span (b-side = doc 20)
    assert(out(20L)._3 > 0L, s"anchor arm silent on doc 20: $out")
    // strictness: the short repeat is LCP-only on doc 30
    assert(out(30L)._2 >= short.length && out(30L)._3 == 0L,
      s"LCP-only repeat missed on doc 30: $out")
    assert(out(40L)._2 == 0L && out(40L)._3 == 0L)
    // exact cover counts vs brute force
    val tr = lcpCoverTruth(docs)
    docs.foreach { case (id, _) =>
      assert(out(id)._2 == tr(id), s"doc $id cover ${out(id)._2} != truth ${tr(id)}")
    }
  }

  test("q325 rewrite: char-mass conservation and brute-force kept text") {
    import spark.implicits._
    val shared = ("the quick brown fox jumps over the lazy dog " * 2).trim
    val docs = Seq(
      (10L, s"start $shared middle unique ten"),
      (20L, s"other $shared closing twenty"),
      (30L, "entirely novel content with no repeats whatsoever"))
    val dir = Files.createTempDirectory("lcprw-corpus")
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val out = operators.SuffixIndex.q325LcpRewrite(spark, dir.toString)
      .as[(Long, Long, Long, Long, String)].collect()
      .map { case (id, nc, rm, kp, h) => id -> ((nc, rm, kp, h)) }.toMap
    def md5(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // brute-force kept text from the cover-truth positions
    val sufs = for ((id, t) <- docs; p <- 1 to t.length) yield (t.substring(p - 1), id, p)
    val sorted = sufs.sortBy(x => (x._1, x._2, x._3))
    val lcps = sorted.sliding(2).collect { case Seq((sa, _, _), (sb, _, _)) =>
      sa.zip(sb).takeWhile { case (x, y) => x == y }.size
    }.toArray
    val cov = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Int]]()
    for (i <- sorted.indices) {
      val m = math.max(if (i > 0) lcps(i - 1) else 0,
        if (i < lcps.length) lcps(i) else 0)
      if (m >= operators.SuffixIndex.LcpTrimMinSpan) {
        val (_, id, p) = sorted(i)
        val set = cov.getOrElseUpdate(id, scala.collection.mutable.Set[Int]())
        (p until p + m).foreach(set += _)
      }
    }
    docs.foreach { case (id, t) =>
      val removed = cov.get(id).map(_.size.toLong).getOrElse(0L)
      val keptTxt = t.zipWithIndex
        .collect { case (c, i) if !cov.get(id).exists(_.contains(i + 1)) => c }
        .mkString
      val (nc, rm, kp, h) = out(id)
      assert(nc == t.length.toLong && rm == removed &&
        kp == nc - rm && h == md5(keptTxt),
        s"doc $id rewrite mismatch: got ${out(id)}, want " +
          s"(${t.length}, $removed, ${t.length - removed}, ${md5(keptTxt)})")
    }
    // the shared block is duplicated, so something was actually removed
    assert(out(10L)._2 > 0 && out(20L)._2 > 0 && out(30L)._2 == 0)
  }

  test("q315 on the shared corpus: equals brute force; q290 pool spans lower-bound the global max") {
    import spark.implicits._
    val docs = operators.Dedup.suffixPoolDocs(
      Tables.load(spark, sf, "documents"))
      .as[(Long, String)].collect().toSeq
    val tr = truth(docs)
    val got = q315Set(sf)
    assert(got == tr, s"missing=${(tr -- got).take(3)} extra=${(got -- tr).take(3)}")

    // anchor-gram cross-check: q290 spans whose BOTH docs are in the
    // pool are verbatim repeats, so their char length cannot exceed the
    // LCP layer's longest repeated substring
    val poolIds = docs.map(_._1).toSet
    val spanChars = operators.Dedup.q290ExactSubstring(spark, sf)
      .select("doc_a", "doc_b", "span").as[(Long, Long, String)].collect()
      .filter(x => poolIds.contains(x._1) && poolIds.contains(x._2))
      .map(_._3.length.toLong)
    val globalMax = (got.map(_._4) + 0L).max
    assert(spanChars.forall(_ <= globalMax),
      s"a q290 pool span (${spanChars.max} chars) exceeds q315's global max $globalMax")
  }
}
