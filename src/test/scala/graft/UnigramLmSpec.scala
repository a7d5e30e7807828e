package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q316 (unigram-LM tokenizer trainer) invariants: a whole-word piece
  * dominates any split under seed frequencies (max-product correctness
  * on a known lattice), pruning keeps the vocabulary monotone (≤
  * VocabTarget multi-char pieces, single chars never pruned away from
  * coverage), every trained piece is a corpus substring within the
  * piece-length bound, and the trainer is deterministic.
  */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def train(docs: Seq[(Long, String)]): Seq[(String, Long, Double)] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("ulm-corpus")
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    operators.Bpe.q316UnigramLm(spark, dir.toString)
      .as[(String, Long, Double)].collect().toSeq
  }

  test("a whole-word piece dominates any split: single-word corpus trains to one piece") {
    // p(banana) = c/T with T > c, so any k-piece split's product
    // (c/T)^k loses to the whole word; after pruning the unused single
    // chars carry zero mass and iteration 2 is a fixed point
    val out = train(Seq((1L, "banana banana banana banana")))
    assert(out == Seq(("banana", 4L, 1.0)))
  }

  test("q318 encode: whole-word vocab gives 1 token/word economics") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ulm-enc")
    Seq((1L, "banana banana banana banana", "en"),
      (2L, "banana banana", "de"))
      .toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val out = operators.Bpe.q318UnigramEncode(spark, dir.toString)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    // vocab trains to {banana}; Viterbi picks the single-piece cover,
    // so every word encodes to exactly one 6-char token
    assert(out == Seq(("de", 2L, 2L, 1.0, 6.0), ("en", 4L, 4L, 1.0, 6.0)))
  }

  test("q324 tokenizer-true UniMax: per-language masses equal q318's economics; allocation conserves the budget") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val econ = operators.Bpe.q318UnigramEncode(spark, sf)
      .select("lang", "n_words", "n_tokens")
      .as[(String, Long, Long)].collect()
      .map { case (l, w, t) => l -> ((w, t)) }.toMap
    val um = operators.Bpe.q324TokenizerUnimax(spark, sf)
      .select("lang", "n_words", "n_tokens", "capacity", "capped", "alloc_tokens")
      .as[(String, Long, Long, Long, Boolean, Double)].collect()
    assert(um.nonEmpty)
    // consistency with q318: the allocation is priced from EXACTLY the
    // economics q318 reports (same committed vocabulary, same drops)
    um.foreach { case (l, w, t, _, _, _) =>
      assert(econ(l) == ((w, t)), s"lang $l masses diverge from q318")
    }
    // capped languages get exactly their capacity; the full allocation
    // exhausts the budget (up to the 4dp rounding of each uncapped share)
    val budget = um.map(_._3).sum * 3 / 2
    um.filter(_._5).foreach { case (l, _, _, cap, _, alloc) =>
      assert(alloc == cap.toDouble, s"capped lang $l alloc != capacity")
    }
    assert(math.abs(um.map(_._6).sum - budget) <= 0.0001 * um.length,
      s"allocation ${um.map(_._6).sum} does not exhaust budget $budget")
  }

  test("pruning is monotone and pieces are in-bounds substrings; trainer is deterministic") {
    val docs = Seq(
      (1L, "unfolding unfolding refolding refolding folding"),
      (2L, "unfold refold fold folding unfolding"),
      (3L, "un re fold ing unfoldingrefolding"))
    val out = train(docs)
    val words = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty).toSet
    assert(out.nonEmpty)
    // every trained piece is a substring of some word, within bounds
    assert(out.forall { case (p, _, _) =>
      p.length >= 1 && p.length <= operators.Bpe.UlmMaxPiece &&
        words.exists(_.contains(p))
    })
    // monotone under pruning: the multi-char shelf never exceeds target
    assert(out.count(_._1.length > 1) <= operators.Bpe.UlmVocabTarget)
    // counts are positive and probabilities normalize (12dp rounding)
    assert(out.forall(_._2 > 0))
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-9 * out.size + 1e-9)
    // token-mass conservation: each word contributes wc per optimal
    // edge; total piece CHARS weighted by uses must equal total corpus
    // chars of trained words (every position covered exactly once per
    // best segmentation)
    val totalChars = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .filter(_.length <= operators.Bpe.UlmMaxWordLen).map(_.length).sum
    assert(out.map { case (p, n, _) => p.length * n }.sum == totalChars)
    // deterministic: a second run is byte-equal
    assert(train(docs) == out)
  }
}
