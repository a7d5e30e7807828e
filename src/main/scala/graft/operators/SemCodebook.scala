package graft.operators

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.ParquetIO

/** Persisted q292 slice codebook — the [[ArtifactStore]] protocol
  * applied to the incremental-SemDeDup gauge (VERDICT r11 "What's
  * wrong" #1, the q173 precedent): through round 11
  * [[Similarity.q292IncrementalSemdedup]] trained its IVF codebook with
  * full Lloyd rounds IN-QUERY on every invocation, making q292 the
  * single most expensive bench query (driver 9.1 s trimmed median at
  * sf0.1). The codebook is a pure function of the source bytes — the
  * [[Similarity.SemDedupGaugeCap]] md5-ranked slice, its base members
  * (vec_id % 10 ≠ 7), salt "c" [[Similarity.ivfCodebookOf]] training —
  * so it is exactly the shape this repo's artifact discipline exists
  * for: build once per corpus fingerprint, read a ≤[[Similarity.IvfK]]-
  * row parquet ever after.
  *
  *  - `codebook` (centroid_id, cv, cnrm) — the trained coarse
  *    quantizer. All training arithmetic is order-free (md5-ranked
  *    TakeOrdered sample, struct-min assignment, exact-integer
  *    quantized centroid means), so the committed table is
  *    bit-identical to the in-query training it replaced and q292's
  *    DuckDB oracle — which re-derives the training relationally —
  *    needs no change.
  *
  * No append arm: the slice is the [[Similarity.SemDedupGaugeCap]]
  * smallest-md5 vec_ids of the WHOLE corpus, so any appended file can
  * displace members and silently shift the training set — `appendBuild`
  * always demands the full rebuild (which is itself one bounded-slice
  * Lloyd run, seconds at any corpus size; the O(delta) economics other
  * stores need do not apply to a fixed-size gauge input).
  */
object SemCodebook extends ArtifactStore {

  /** Bump on ANY change to the slice or training algebra not captured
    * by the geometry knobs below.
    */
  val AlgoVersion = 1

  protected def storeKind: String = "semcb"
  protected def geometry: String =
    s"g:$AlgoVersion,${Similarity.SemDedupGaugeCap},${Similarity.IvfK}," +
      s"${Similarity.IvfSampleN}"
  protected def allTables: Seq[String] = Seq("codebook")

  protected def listing(dir: String): Seq[(String, String)] =
    tableListing(dir, "embeddings")

  protected def build(s: SparkSession, root: Path, snap: Seq[(String, String)]): Unit = {
    import s.implicits._
    require(snap.nonEmpty, s"sem codebook build: no embeddings files for $root")
    val emb = s.read.parquet(snap.map(_._2): _*)
      .select($"vec_id", $"embedding")
      .repartition(s.sparkContext.defaultParallelism)
    val base = Similarity.semSliceAll(s, emb).filter($"vec_id" % 10 =!= 7)
    val cb = Similarity.ivfCodebookOf(s, base.select($"vec_id", $"v"), "c")
    ParquetIO.overwriteSwap(cb, root.resolve("codebook").toString)
    writeSources(root, "codebook", snap.map(_._1).toSet)
  }

  /** Appends can displace md5-ranked slice members — always rebuild. */
  protected def appendBuild(s: SparkSession, root: Path,
      newFiles: Seq[(String, String)], snap: Seq[(String, String)]): Boolean = false

  /** (centroid_id, cv, cnrm) — the committed slice codebook. */
  def codebook(s: SparkSession, dir: String): DataFrame = {
    ensure(s, dir)
    ParquetIO.read(s, tableDir(dir, "codebook"))
  }
}
