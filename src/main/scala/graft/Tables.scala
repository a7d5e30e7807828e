package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * One parquet dir per table under the scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** events.parquet has shipped `ts` two ways across generator
    * versions: INT64 TIMESTAMP(NANOS) — which the vectorized reader
    * rejects, so read nanos as long (session conf) and convert with
    * exact integral division — and a true parquet TIMESTAMP, which
    * surfaces as TIMESTAMP_NTZ and breaks unix_micros/watermark call
    * sites. Normalize both to a session-tz TimestampType; the session
    * is pinned UTC, so the NTZ cast is value-preserving and
    * oracle-identical.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else tsVariant(df.schema("ts").dataType)._2(df)
  }

  /** The (physical read type → normalizer to session-tz TimestampType)
    * mapping for events.ts, shared by this batch loader and the
    * streaming file source ([[graft.streaming.StreamingOps]]) so batch
    * and streaming reads of the same files can never disagree on a
    * generator variant.
    */
  def tsVariant(dt: org.apache.spark.sql.types.DataType)
      : (org.apache.spark.sql.types.DataType, DataFrame => DataFrame) = dt match {
    case LongType => // INT64 TIMESTAMP(NANOS) read raw via nanosAsLong
      (LongType, df => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000"))))
    case org.apache.spark.sql.types.TimestampNTZType => // true parquet TIMESTAMP
      (org.apache.spark.sql.types.TimestampNTZType,
        df => df.withColumn("ts", col("ts").cast("timestamp")))
    case other => (other, identity[DataFrame] _)
  }

  /** Load + spread across all cores. The test tables arrive as a single
    * row group, so scans parallelize to ONE task; for CPU-bound per-row
    * work (sketches, pairwise similarity) that serializes the whole
    * query. One round-robin repartition unlocks the other N-1 cores — on
    * a real cluster the equivalent is writing the source with sane file
    * sizes, but an engine must handle pathological layouts it didn't
    * write.
    */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)
}
