package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** q319 (span-corruption batch prep) against a per-document brute-force
  * replay of the rule: md5-coin starts, clipped lengths, overlap-merge
  * to sentinel runs, encoder/decoder length accounting.
  */
class SpanCorruptionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def truth(docId: Long, text: String): (Long, Long, Long, Long, Long) = {
    val n = text.split(" ", -1).length.toLong
    val covered = scala.collection.mutable.SortedSet.empty[Long]
    for (i <- 1L to n) {
      val h = md5hex(s"sc:$docId:$i")
      if (h.substring(0, 8) < operators.Curation.ScStartHex) {
        val len = 1L + java.lang.Long.parseLong(h.substring(8, 16), 16) %
          operators.Curation.ScLenMod
        (i to math.min(i + len - 1, n)).foreach(covered += _)
      }
    }
    val noised = covered.size.toLong
    val spans = covered.toSeq.zipWithIndex
      .map { case (p, k) => p - k }.distinct.size.toLong
    (n, noised, spans, n - noised + spans, noised + spans + 1)
  }

  test("q319 equals the brute-force replay on synthetic and shared corpora") {
    import spark.implicits._
    val synth = (1L to 40L).map(i =>
      (i, (1 to (3 + (i % 60)).toInt).map(k => s"t$k").mkString(" ")))
    val dir = Files.createTempDirectory("sc-corpus")
    synth.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    for (d <- Seq(dir.toString, "/root/testdata/sf0.001")) {
      val docs = Tables.load(spark, d, "documents")
        .select($"doc_id", $"text").as[(Long, String)].collect()
      val expect = docs.map { case (id, t) =>
        val (n, no, sp, in, tg) = truth(id, t); (id, n, no, sp, in, tg)
      }.sortBy(_._1).toSeq
      val got = operators.Curation.q319SpanCorruption(spark, d)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(got == expect, s"mismatch on $d: ${got.diff(expect).take(3)}")
    }
  }
}
