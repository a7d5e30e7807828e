package graft.operators

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.ParquetIO

/** Persisted unigram-LM tokenizer vocabulary — the [[ArtifactStore]]
  * protocol applied to q316's trainer: a production tokenizer is
  * trained ONCE and shipped with the pipeline (the SentencePiece model
  * file); re-running two EM closures per query invocation is the same
  * anti-pattern the SemCodebook/SuffixIndex artifacts removed. Table:
  *
  *  - `vocab` (piece, cnt, p) — the final vocabulary with optimal-edge
  *    use counts and round(cnt/total, 12)-pinned probabilities
  *    ([[Bpe.unigramTrain]]).
  *
  * Consumers: q316 (the trainer's oracle-carried output — its DuckDB
  * oracle replays the FULL trainer relationally per gate run, so the
  * committed vocabulary is re-proven against brute force every round)
  * and q318 (the encode pass: Viterbi segmentation economics under the
  * committed vocabulary).
  *
  * No append arm: the trainer input is the corpus-global frequency-cut
  * word-type table — appended files shift type counts and can displace
  * frequency-cut members wholesale, so any source change rebuilds (the
  * [[SemCodebook]] posture; a rebuild is two vocabulary-sized EM
  * closures, seconds at any corpus size since the corpus-sized work is
  * one word-count scan).
  */
object UlmIndex extends ArtifactStore {

  /** Bump on ANY change to the trainer algebra the geometry knobs
    * below don't capture.
    */
  val AlgoVersion = 2 // r13: association-independent per-word Viterbi edge recovery

  protected def storeKind: String = "ulm"
  protected def geometry: String =
    s"g:$AlgoVersion,${Bpe.UlmMaxPiece},${Bpe.UlmSeedN},${Bpe.UlmVocabTarget}," +
      s"${Bpe.UlmTrainWords},${Bpe.UlmMaxWordLen},${Bpe.UlmRounds}"
  protected def allTables: Seq[String] = Seq("vocab")

  protected def listing(dir: String): Seq[(String, String)] =
    tableListing(dir, "documents")

  protected def build(s: SparkSession, root: Path, snap: Seq[(String, String)]): Unit = {
    require(snap.nonEmpty, s"ulm vocab build: no documents files for $root")
    val docs = s.read.parquet(snap.map(_._2): _*)
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
    ParquetIO.overwriteSwap(Bpe.unigramTrain(s, docs),
      root.resolve("vocab").toString)
    writeSources(root, "vocab", snap.map(_._1).toSet)
  }

  /** Appends shift the frequency-cut trainer input — always rebuild. */
  protected def appendBuild(s: SparkSession, root: Path,
      newFiles: Seq[(String, String)], snap: Seq[(String, String)]): Boolean = false

  /** (piece, cnt, p) — the committed vocabulary. */
  def vocab(s: SparkSession, dir: String): DataFrame = {
    ensure(s, dir)
    ParquetIO.read(s, tableDir(dir, "vocab"))
  }
}
