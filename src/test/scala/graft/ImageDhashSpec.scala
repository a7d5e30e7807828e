package graft

import org.scalatest.funsuite.AnyFunSuite

/** q291's completeness bracket: the 4×16-bit exact-collision banding is
  * COMPLETE for Hamming ≤ 3 by pigeonhole (3 differing bits cannot
  * touch 4 bands), so — modulo the documented bucket df-cap, which must
  * not bind on this corpus (asserted) — the banded pair set must EQUAL
  * the brute-force exact-Hamming truth, recall 1.0 and precision 1.0,
  * not bracket it. Also locks the body-only contract: the re-crawl
  * twin of a doc carries a DIFFERENT header format (id % 3 rotates),
  * so at least one distance-0 pair must cross formats — a hash that
  * read header bytes would push those pairs past the tolerance.
  */
class ImageDhashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q291 banded pairs equal brute-force Hamming truth; hashes ignore headers") {
    import spark.implicits._
    val banded = operators.Multimodal.q291ImageDhash(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val hs = operators.Multimodal.dhashes(spark, dir)
      .as[(Long, Long)].collect().sortBy(_._1)
    val truth = (for {
      i <- hs.indices.iterator
      j <- (i + 1) until hs.length
      if java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2) <=
        operators.Multimodal.DHashHammingTol
    } yield (hs(i)._1, hs(j)._1)).toSet
    assert(truth.nonEmpty, "re-crawl corpus must contain distance-0 pairs")
    assert(banded == truth,
      s"banding must be exact at tol<=3: missed=${(truth -- banded).take(5)} " +
        s"extra=${(banded -- truth).take(5)}")
    // the df-cap must not have bound (else the equality above is luck)
    val maxBucket = operators.Multimodal.dhashes(spark, dir)
      .selectExpr("explode(array(0,1,2,3)) as band", "dh")
      .selectExpr("band", "shiftright(dh, band*16) & 65535 as bv")
      .groupBy("band", "bv").count().agg(org.apache.spark.sql.functions.max("count"))
      .as[Long].head()
    assert(maxBucket <= operators.Multimodal.DHashBandDfCap,
      s"bucket cap binds on the test corpus ($maxBucket) — equality assertion invalid")
    // body-only hashing: some distance-0 pair crosses header formats
    val crossFormat = truth.exists { case (a, b) => a % 3 != b % 3 }
    assert(crossFormat, "expected a distance-0 pair with differing header formats")
  }

  test("q294 banded pairs equal brute-force Hamming truth; fingerprint is amplitude-invariant") {
    import spark.implicits._
    val banded = operators.Multimodal.q294AudioFingerprint(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val hs = operators.Multimodal.afpPayloads(spark, dir)
      .as[(Long, Array[Byte])]
      .map { case (id, b) => (id, operators.Multimodal.audioFingerprint(b)) }
      .collect().sortBy(_._1)
    val truth = (for {
      i <- hs.indices.iterator
      j <- (i + 1) until hs.length
      if java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2) <=
        operators.Multimodal.DHashHammingTol
    } yield (hs(i)._1, hs(j)._1)).toSet
    assert(banded == truth,
      s"banding must be exact at tol<=3: missed=${(truth -- banded).take(5)} " +
        s"extra=${(banded -- truth).take(5)}")
    // every planted half-amplitude re-encode must be found — the
    // fingerprint reads the loudness CONTOUR, not the sample values
    // (bytes differ on every sample; truncation may cost a bit or two,
    // never the pair)
    val tw = operators.Dedup.TwinOffset
    val planted = hs.map(_._1).filter(id => id < tw && id % 10 == 0)
      .map(id => (id, id + tw)).toSet
    assert(planted.nonEmpty && planted.subsetOf(banded),
      s"missed re-encode twins: ${(planted -- banded).take(5)}")
  }

  /** The q291 oracle samples code points via `ascii(substr(text, …))`
    * with CHAR offsets while [[operators.Multimodal.dhash64]] reads raw
    * payload BYTES — the two agree only while the corpus is pure ASCII.
    * That invariant was implicit; pin it here so a future non-ASCII
    * regeneration of the documents table fails THIS assertion loudly
    * instead of silently hash-breaking q291/q295.
    */
  test("documents corpus is pure ASCII (the dhash64/mp4 oracle equivalence precondition)") {
    import spark.implicits._
    val nonAscii = Tables.load(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.not($"text".rlike("^[\\x00-\\x7F]*$")))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii documents carry non-ASCII text — the byte-offset kernels " +
        "and the char-offset oracles no longer sample the same values")
  }
}
