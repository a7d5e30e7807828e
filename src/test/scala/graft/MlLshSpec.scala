package graft

import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** spark-mllib integration: MinHashLSH.approxSimilarityJoin over the same
  * shingle sets, cross-checked against the exact-Jaccard ground truth
  * (q18). Our engine ships its own deterministic MinHash (q19) because
  * the oracle gate needs engine-independent hashes; this spec shows the
  * mllib estimator drops in where cross-engine determinism isn't needed,
  * and that its recall on the known near-dup pairs is high.
  */
class MlLshSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("mllib MinHashLSH finds the exact-Jaccard near-dup pairs") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", array_distinct(operators.Dedup.shingles($"text")).as("shs"))
      .filter(size($"shs") > 0)
    val cv = new CountVectorizer().setInputCol("shs").setOutputCol("features")
      .setBinary(true).fit(docs)
    val vecs = cv.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(16).setSeed(42L).fit(vecs)
    // jaccard distance 0.4 == jaccard similarity 0.6, q18's threshold
    val approx = lsh.approxSimilarityJoin(vecs, vecs, 0.4, "dist")
      .select(col("datasetA.doc_id").as("doc_a"), col("datasetB.doc_id").as("doc_b"))
      .filter($"doc_a" < $"doc_b").distinct()
    val exact = operators.Dedup.q18DedupJaccard(spark, dir)
      .select($"doc_a", $"doc_b")
    val nExact = exact.count()
    val found = exact.join(approx, Seq("doc_a", "doc_b")).count()
    assert(nExact > 0)
    assert(found >= (nExact * 0.8).toLong,
      s"mllib LSH recall too low: $found of $nExact")
  }
}
