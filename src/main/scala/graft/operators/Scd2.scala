package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD2 snapshot — dbt's `snapshot` materialization with
  * `strategy='timestamp'` and `invalidate_hard_deletes=True`, re-expressed
  * as a pure DataFrame transform (SURVEY.md §2.9; reference:
  * firmographics_dbt/snapshots/company_location_snapshot.sql:1-20,
  * fortune_metrics_snapshot.sql:1-33).
  *
  * Semantics reproduced exactly:
  *  - first run: every batch row opens with dbt_valid_from = updated_at,
  *    dbt_valid_to = NULL, dbt_scd_id = md5(key || '|' || updated_at);
  *  - key in both and batch.updated_at > current.dbt_updated_at: close the
  *    current version at batch.updated_at and open a new one — even when
  *    the non-key values are unchanged (the timestamp strategy compares
  *    only the timestamp; SURVEY.md §2.9 "reproduce this, don't fix it");
  *  - key only in batch: open a new version;
  *  - key only in history (hard delete): close at `asOf` when
  *    invalidateHardDeletes, else keep open;
  *  - anything else: no-op.
  *
  * `asOf` is an explicit parameter rather than now(): it makes snapshot
  * runs deterministic/replayable (and thus oracle-checkable) — at scale
  * the orchestrator passes the batch's logical timestamp.
  *
  * Scale: one full-outer shuffle join of the *current* slice (one row per
  * key) against the batch, plus a cheap union with the untouched closed
  * history — no windows over the whole history, so cost is O(current+batch)
  * per run regardless of accumulated history depth. Closed history is
  * written once and only appended to (write-side handled by the caller /
  * Pipeline's overwrite-swap).
  */
object Scd2 {

  val MetaCols: Seq[String] =
    Seq("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to")

  private def scdId(keyCols: Seq[String], updatedAt: Column): Column =
    md5(concat_ws("|",
      (keyCols.map(k => coalesce(col(k).cast("string"), lit(""))) :+
        coalesce(updatedAt.cast("string"), lit(""))): _*))

  /** Stamp a batch as all-new open versions (dbt first-run semantics). */
  def firstRun(batch: DataFrame, keyCols: Seq[String], updatedAtCol: String): DataFrame = {
    val u = col(updatedAtCol)
    batch
      .withColumn("dbt_scd_id", scdId(keyCols, u))
      .withColumn("dbt_updated_at", u)
      .withColumn("dbt_valid_from", u)
      .withColumn("dbt_valid_to", lit(null).cast(batch.schema(updatedAtCol).dataType))
  }

  /** One snapshot run: fold `batch` into `history`. */
  def snapshot(
      history: DataFrame,
      batch: DataFrame,
      keyCols: Seq[String],
      updatedAtCol: String,
      asOf: Column,
      invalidateHardDeletes: Boolean = true): DataFrame = {

    val dataCols = history.columns.filterNot(MetaCols.contains).toSeq
    val closed = history.filter(col("dbt_valid_to").isNotNull)
    val current = history.filter(col("dbt_valid_to").isNull)

    val b = firstRun(batch, keyCols, updatedAtCol)
      .select((dataCols ++ MetaCols).map(c => col(c).as(s"b_$c")): _*)
    val joinCond = keyCols
      .map(k => col(k) <=> col(s"b_$k"))
      .reduce(_ && _)
    val j = current.join(b, joinCond, "full_outer")

    val inCurrent = col("dbt_scd_id").isNotNull
    val inBatch = col(s"b_dbt_scd_id").isNotNull
    val newer = inCurrent && inBatch &&
      (col(s"b_dbt_updated_at") > col("dbt_updated_at"))

    // Surviving version of each pre-existing current row: closed if
    // superseded (at the batch row's updated_at) or hard-deleted (at asOf).
    val keptCurrent = j.filter(inCurrent).select(
      (dataCols.map(col) :+ col("dbt_scd_id") :+ col("dbt_updated_at") :+
        col("dbt_valid_from") :+
        when(newer, col(s"b_dbt_updated_at"))
          .when(!inBatch && lit(invalidateHardDeletes), asOf)
          .otherwise(lit(null))
          .cast(history.schema("dbt_valid_from").dataType)
          .as("dbt_valid_to")): _*)

    // New open versions: brand-new keys, or newer reingests of known keys.
    val inserts = j.filter(inBatch && (!inCurrent || newer))
      .select((dataCols ++ MetaCols).map(c => col(s"b_$c").as(c)): _*)

    closed.unionByName(keptCurrent).unionByName(inserts)
  }
}
