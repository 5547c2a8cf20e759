package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.store.KeyedTable

/** Secondary index as a DERIVED KeyedTable (SURVEY §2 A33): rows of
  * `(indexedCol, baseKeys…)` BUCKET-KEYED BY THE INDEXED COLUMN, so a
  * non-key point lookup becomes two bucket-pruned reads — index probe
  * (value → base keys) then [[KeyedTable.snapshotForKeys]] on the base
  * — instead of a full table scan. At 100 TB that is two ~bucket-sized
  * reads.
  *
  * The index is just another table of the engine: it is maintained
  * incrementally from the base's change feed (the same CDF every
  * downstream join consumes), its merges are exactly-once via batch
  * ids, and it is multi-writer-safe like any KeyedTable. The logical
  * key is `(value, baseKeys…)` — declared with the base keys as
  * `nullableKeys` so the BUCKET key is the indexed column alone and
  * value probes prune to one bucket.
  *
  * A refresh applies the net effect of the pending change range:
  * stale entries (pre-images and deletes) are removed, current entries
  * (latest insert/post-image per base key) upserted. The two commits
  * are not atomic — a reader between them sees the index briefly
  * missing entries, never returning stale ones as current (the base
  * join re-validates anyway).
  */
object SecondaryIndex {

  private def idxCols(base: KeyedTable, column: String): Seq[String] =
    column +: base.meta.keys

  /** Creates the (empty) index table and loads the base's current
    * snapshot into it. */
  def create(spark: SparkSession, path: String, base: KeyedTable,
      column: String, numBuckets: Int = 32): KeyedTable = {
    require(base.dataCols.contains(column), s"no column $column in base")
    require(!base.meta.keys.contains(column), "indexing a key column is pointless")
    val cols = idxCols(base, column)
    val schema = org.apache.spark.sql.types.StructType(
      cols.map(c => base.schema(base.schema.fieldIndex(c))))
    val idx = KeyedTable.create(spark, path, schema,
      keys = cols, nullableKeys = base.meta.keys, numBuckets = numBuckets)
    idx.upsert(base.snapshot().select(cols.map(col): _*), uniqueKeys = true)
    idx
  }

  /** Applies the base's changes in `(sinceVersion, latest]` to the
    * index; returns the base version the index now reflects. Safe to
    * re-run (replays are detected by `batchId` when provided). */
  def refresh(idx: KeyedTable, base: KeyedTable, sinceVersion: Long,
      batchId: Long = -1L): Long = {
    val upTo = base.latestVersion
    // replay guard covers BOTH halves: a completed refresh re-run with
    // the same batchId must not re-delete stale entries (a key whose
    // value went A→B→A in the range has (A, key) both live and present
    // as a pre-image — re-deleting it while the batchId guard skips the
    // re-asserting upsert would lose the live entry). A replay after a
    // crash BETWEEN the two commits re-runs both: the delete half is
    // idempotent, and the upsert's own guard hasn't fired yet.
    if (batchId >= 0 && batchId <= idx.lastAppliedBatchId) return upTo
    val cols = idx.dataCols // (column, baseKeys…)
    val ch = base.changesSince(sinceVersion)
      .where(col("_commit_version") <= upTo)
    val keyCols = idx.meta.nullableKeys // = base keys
    // the latest image per base key decides the CURRENT index entry;
    // change types order within one commit: delete/postimage supersede
    // their preimage
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "update_preimage", 0).otherwise(1).desc)
    val latest = ch.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
    // every value that appears as a pre-image or delete is potentially
    // stale — remove those exact (value, key) entries…
    val stale = ch.where(col("_change_type").isin("update_preimage", "delete"))
      .select(cols.map(col): _*).distinct()
    if (!stale.isEmpty) idx.delete(stale)
    // …then (re)assert the current entries
    val current = latest.where(col("_change_type").isin("insert", "update_postimage"))
      .select(cols.map(col): _*)
    if (!current.isEmpty) idx.upsert(current, uniqueKeys = true, batchId = batchId)
    upTo
  }

  /** Base rows whose indexed column matches a value in `values`
    * (single column named like the indexed column): index probe →
    * bucket-pruned base read. Rows are re-validated against the base
    * (an index entry only directs the read; the base row's own value
    * decides membership). */
  def lookup(idx: KeyedTable, base: KeyedTable, values: DataFrame): DataFrame = {
    val column = idx.meta.bucketKeys.head
    val keys = idx.snapshotForKeys(values.select(col(column)))
      .select(idx.meta.nullableKeys.map(col): _*).distinct()
    base.snapshotForKeys(keys)
      .join(broadcast(values.select(col(column)).distinct()), Seq(column), "left_semi")
  }
}
