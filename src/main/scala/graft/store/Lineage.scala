package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization for engine-internal reuse frames (r15 optimization).
  *
  * The merge/drain hot loops persist small per-commit frames (staged
  * batches, merge-join outputs, retraction key sets) purely so ONE
  * commit's handful of actions share the computation. `Dataset.persist`
  * is the wrong tool for that job twice over:
  *   - it stores COLUMNAR CachedBatches — per-column encode, min/max
  *     stats and compression on write (thread dumps showed
  *     `DecimalColumnStats.gatherStats`/`DOUBLE$.append` burning the
  *     write job's task time) — machinery built for long-lived reused
  *     tables, pure overhead for a frame read 2-4× and dropped;
  *   - it caches the DATA but not the PLAN: every downstream action
  *     re-analyzes, re-optimizes and cache-canonicalizes the frame's
  *     full upstream tree (a deep pipeline's worth per commit).
  * A lazy `localCheckpoint` fixes both: plain row blocks (UnsafeRow
  * copies, no encode, no stats) and a `LogicalRDD` leaf plan, at zero
  * extra jobs — the frame's first action materializes it exactly where
  * the persist used to.
  *
  * Trade-off (documented in the Spark API): checkpoint blocks are
  * non-replayable, so losing an executor mid-commit fails that commit
  * instead of recomputing; the OCC/batchId machinery makes a caller
  * rerun idempotent. `spark.graft.merge.truncateLineage=false` restores
  * the persist path everywhere (also the A/B toggle).
  */
object Lineage {
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption("spark.graft.merge.truncateLineage")
        .contains("false"))
      df.persist(StorageLevel.MEMORY_AND_DISK)
    else df.localCheckpoint(eager = false)

  /** Frees a [[pin]]ned frame: `unpersist` covers the persist mode, the
    * shim sweep covers checkpoint RDD blocks (which `Dataset.unpersist`
    * cannot reach — they'd otherwise linger until the ContextCleaner's
    * GC-driven sweep). Call only once the frame is provably done with:
    * lineage is truncated, so a later read would fail. */
  def release(df: DataFrame): Unit = {
    df.unpersist()
    org.apache.spark.sql.graft.StreamShim.unpersistTruncated(df)
  }
}
