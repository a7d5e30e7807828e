package graft

import org.scalatest.funsuite.AnyFunSuite

/** q305's completeness bracket, the [[ImageDhashSpec]] contract lifted
  * to the video lane: the sequence-aligned (frame, band) exact-collision
  * join is COMPLETE for total cross-frame Hamming ≤ tol by pigeonhole
  * (≤ 3 differing bits cannot touch all 8 32-bit chunks), so — the
  * df-cap not binding (asserted) — the banded pair set must EQUAL the
  * brute-force truth. Also locks the content-only contract: every
  * planted twin is RE-ENCODED (+32 on every body byte) and
  * RE-CONTAINERED (different brand/spacer/timescale), so finding all of
  * them at distance 0 proves the pipeline hashes demuxed frame content,
  * never container bytes or raw sample values.
  */
class VideoNearDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q305 banded pairs equal brute-force truth; re-encoded re-containered twins all found") {
    import spark.implicits._
    val banded = operators.Multimodal.q305VideoNearDup(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val hs = operators.Multimodal.videoHashes(spark, dir)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3)
      }.toSeq.sortBy(_._1)
    val truth = (for {
      i <- hs.indices.iterator
      j <- (i + 1) until hs.length
      d = hs(i)._2.zip(hs(j)._2)
        .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
      if d <= operators.Multimodal.DHashHammingTol
    } yield (hs(i)._1, hs(j)._1)).toSet
    assert(truth.nonEmpty, "re-crawl corpus must contain near-dup pairs")
    assert(banded == truth,
      s"banding must be exact at tol<=${operators.Multimodal.DHashHammingTol}: " +
        s"missed=${(truth -- banded).take(5)} extra=${(banded -- truth).take(5)}")
    // df-cap must not have bound (else the equality above is luck)
    val maxBucket = operators.Multimodal.videoHashes(spark, dir)
      .selectExpr("f", "explode(array(0,1)) as band", "h")
      .selectExpr("f", "band", "shiftright(h, band*32) & 4294967295 as bv")
      .groupBy("f", "band", "bv").count()
      .agg(org.apache.spark.sql.functions.max("count")).as[Long].head()
    assert(maxBucket <= operators.Multimodal.DHashBandDfCap,
      s"bucket cap binds on the test corpus ($maxBucket) — equality assertion invalid")
    // every planted twin found (distance 0: the +32 shift is monotone,
    // the container never enters the hash)
    val tw = operators.Dedup.TwinOffset
    val eligible = hs.map(_._1).filter(id => id < tw && id % 10 == 0).toSet
    val planted = hs.map(_._1).filter(id => id >= tw)
      .map(id => (id - tw, id)).filter(p => eligible(p._1)).toSet
    assert(planted.nonEmpty && planted.subsetOf(banded),
      s"missed re-encode twins: ${(planted -- banded).take(5)}")
    // the twin pairs really cross container formats (brand = id % 3)
    assert(planted.exists { case (a, b) => a % 3 != b % 3 },
      "expected at least one twin pair with differing ftyp brands")
  }
}
