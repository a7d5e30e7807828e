package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Multimodal column plumbing (north-star extension, BASELINE.json):
  * media payloads are opaque `binary` columns with typed metadata structs;
  * decode/feature-extraction runs partition-parallel over the binary
  * bytes. This container ships no image/audio codecs, so `decodeStub`
  * below is a clearly-marked deterministic fake — the Spark-side plumbing
  * (binary column, schema, partition-wise batch map, metadata struct) is
  * the real, tested part.
  *
  * Scale: decode is per-row opaque compute — the one legitimate
  * `mapPartitions` site (SURVEY.md preference order (d)); everything
  * before it is a pruned columnar scan of just (doc_id, payload), and the
  * decoded metadata re-enters Catalyst as a flat typed row for downstream
  * relational work.
  */
object Multimodal {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Decoded-media metadata row (what a real image decoder would emit). */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      width: Long,
      height: Long,
      format: String)

  /** STUB decoder: a real pipeline would decode image/audio bytes here
    * (e.g. via a JNI codec) inside mapPartitions, one partition's batch at
    * a time. The fake is a deterministic function of the byte length and
    * id so the oracle can check the plumbing end-to-end.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      doc_id = docId,
      byte_len = n,
      width = n % 640 + 16,
      height = (n * 7) % 480 + 16,
      format = (docId % 3) match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "webp"
      })
  }

  /** q27: binary media-column pipeline: text bytes stand in for an image
    * payload (UTF-8 `binary` column); a partition-parallel decode pass
    * emits typed metadata; a relational tail aggregates by format. The
    * narrow (doc_id, payload) projection is what reaches the scan.
    */
  def q27MultimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val meta = media
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
    meta
      .select($"doc_id", $"byte_len", $"width", $"height", $"format")
      .orderBy($"doc_id")
  }

  private val q27Sql =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS byte_len,
      |  octet_length(encode(text)) % 640 + 16 AS width,
      |  (octet_length(encode(text)) * 7) % 480 + 16 AS height,
      |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q28: frame-sampling plan shape: each media doc expands to a
    * deterministic frame index list (sample every ~10th frame), the
    * per-frame feature extraction being the stubbed identity — this is
    * the explode-then-process layout video pipelines use.
    */
  def q28FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nFrames = ($"doc_id" % 30 + 1).cast("int")
    t(s, dir, "documents")
      .select($"doc_id", nFrames.as("n_frames"))
      .select($"doc_id", $"n_frames",
        explode(sequence(lit(0), $"n_frames" - 1, lit(10))).as("frame_idx"))
      .orderBy($"doc_id", $"frame_idx")
  }

  private val q28Sql =
    """SELECT doc_id, n_frames, unnest(range(0, n_frames, 10)) AS frame_idx
      |FROM (SELECT doc_id, CAST(doc_id % 30 + 1 AS INTEGER) AS n_frames FROM documents)
      |ORDER BY doc_id, frame_idx""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q27_multimodal_decode", Seq("EXT-multimodal"),
      "binary media column + partition-parallel decode stub", q27MultimodalDecode, Some(q27Sql)),
    GraftQuery("q28_frame_sample", Seq("EXT-multimodal"),
      "frame-sampling explode plan", q28FrameSample, Some(q28Sql)))
}
