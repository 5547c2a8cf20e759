package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.store.KeyedTable

/** Secondary index as a DERIVED KeyedTable (SURVEY §2 A33): rows of
  * `(indexedCols…, baseKeys…)` BUCKET-KEYED BY THE INDEXED COLUMNS, so a
  * non-key point lookup becomes two bucket-pruned reads — index probe
  * (value → base keys) then [[KeyedTable.snapshotForKeys]] on the base
  * — instead of a full table scan. At 100 TB that is two ~bucket-sized
  * reads.
  *
  * The index is just another table of the engine: it is maintained
  * incrementally from the base's change feed (the same CDF every
  * downstream join consumes), its merges are exactly-once via batch
  * ids, and it is multi-writer-safe like any KeyedTable. The logical
  * key is `(indexedCols…, baseKeys…)` — declared with the remaining
  * base keys as `nullableKeys` so the BUCKET key is the indexed column
  * set alone and value probes prune to one bucket.
  *
  * A refresh applies the net effect of the pending change range:
  * stale entries (pre-images and deletes) are removed, current entries
  * (latest insert/post-image per base key) upserted. The two commits
  * are not atomic — a reader between them sees the index briefly
  * missing entries, never returning stale ones as current (the base
  * join re-validates anyway).
  */
object SecondaryIndex {

  /** Creates the (empty) single-column index table and loads the base's
    * current snapshot into it. */
  def create(spark: SparkSession, path: String, base: KeyedTable,
      column: String, numBuckets: Int = 32): KeyedTable =
    createMulti(spark, path, base, Seq(column), numBuckets)

  /** Multi-column variant: the bucket key is the whole `columns` set, so
    * probes must carry every indexed column. `columns` may overlap the
    * base's key columns (e.g. indexing one source's pk subset of a join
    * output's composite key) but must not cover the base's full bucket
    * key — the base itself already prunes on that. */
  def createMulti(spark: SparkSession, path: String, base: KeyedTable,
      columns: Seq[String], numBuckets: Int = 32): KeyedTable = {
    require(columns.nonEmpty && columns.forall(base.dataCols.contains),
      s"index columns ${columns.mkString(",")} must exist in the base")
    require(!base.meta.bucketKeys.forall(columns.contains),
      "indexing the base's full bucket key set is pointless — probe the base directly")
    val rest = base.meta.keys.filterNot(columns.contains)
    require(rest.nonEmpty, "index columns must not cover the base's whole key")
    val cols = columns ++ rest
    val schema = org.apache.spark.sql.types.StructType(
      cols.map(c => base.schema(base.schema.fieldIndex(c))))
    val idx = KeyedTable.create(spark, path, schema,
      keys = cols, nullableKeys = rest, numBuckets = numBuckets)
    val baseV = base.latestVersion
    idx.upsert(base.snapshot(baseV).select(cols.map(col): _*), uniqueKeys = true)
    writeApplied(idx, baseV)
    idx
  }

  /** Opens the index at `path` when it exists, else creates it from the
    * base's current snapshot — the lazy-build entry point for callers
    * (e.g. delete retraction) that only need an index once a first
    * delete arrives. */
  def ensure(spark: SparkSession, path: String, base: KeyedTable,
      columns: Seq[String], numBuckets: Int = 32): KeyedTable = {
    val log = new graft.store.CommitLog(path, spark.sessionState.newHadoopConf())
    if (log.exists) KeyedTable.forPath(spark, path)
    else createMulti(spark, path, base, columns, numBuckets)
  }

  // --- applied-base-version marker -----------------------------------------
  // Tracks which base version the index reflects, persisted under the
  // index path so a restarted pipeline resumes its incremental refresh.
  // A crash between refresh and marker write only WIDENS the next
  // refresh range — both refresh halves are idempotent over a replayed
  // range (re-deleting absent entries and re-upserting identical latest
  // images are no-ops).

  private def appliedPath(idx: KeyedTable) =
    new org.apache.hadoop.fs.Path(s"${idx.path}/_applied.json")

  private def fs(idx: KeyedTable) =
    appliedPath(idx).getFileSystem(idx.spark.sessionState.newHadoopConf())

  /** Base version the index reflects; -1 when never recorded. */
  def appliedBaseVersion(idx: KeyedTable): Long = {
    val p = appliedPath(idx)
    val f = fs(idx)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](256)
        var n = in.read(b)
        while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
        """"baseVersion":(\d+)""".r.findFirstMatchIn(
          new String(buf.toByteArray, "UTF-8"))
          .map(_.group(1).toLong).getOrElse(-1L)
      } finally in.close()
    }
  }

  private def writeApplied(idx: KeyedTable, v: Long): Unit = {
    val p = appliedPath(idx)
    val f = fs(idx)
    val out = f.create(p, true)
    try out.write(s"""{"baseVersion":$v}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Catches the index up to the base's latest version using the
    * persisted marker; returns that version. The one-call maintenance
    * loop for long-lived indexes. */
  def sync(idx: KeyedTable, base: KeyedTable): Long = {
    val upTo = refresh(idx, base, appliedBaseVersion(idx))
    writeApplied(idx, upTo)
    upTo
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
    val cols = idx.dataCols // (indexedCols…, remaining baseKeys…)
    val ch = base.changesSince(sinceVersion)
      .where(col("_commit_version") <= upTo)
    val keyCols = base.meta.keys
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

  /** Resolves probe values (one column per indexed column) to FULL base
    * keys through the index alone — no base read. The caller must have
    * [[sync]]ed (or [[refresh]]ed) the index to the base version it
    * intends to act on; against a stale index, route the result through
    * a re-validating [[lookup]] instead. This is the 100 TB path for
    * "delete every base row matching these values": index probe
    * (bucket- and file-pruned) instead of a base snapshot scan. */
  def lookupKeys(idx: KeyedTable, base: KeyedTable, values: DataFrame): DataFrame = {
    val columns = idx.meta.bucketKeys
    idx.snapshotForKeys(values.select(columns.map(col): _*))
      .join(broadcast(values.select(columns.map(col): _*).distinct()),
        columns.toSeq, "left_semi")
      .select(base.meta.keys.map(col): _*).distinct()
  }

  /** Base rows whose indexed columns match a row in `values`: index
    * probe → bucket-pruned base read. Rows are re-validated against the
    * base (an index entry only directs the read; the base row's own
    * values decide membership). */
  def lookup(idx: KeyedTable, base: KeyedTable, values: DataFrame): DataFrame = {
    val columns = idx.meta.bucketKeys
    base.snapshotForKeys(lookupKeys(idx, base, values))
      .join(broadcast(values.select(columns.map(col): _*).distinct()),
        columns.toSeq, "left_semi")
  }

  /** Deletes every base row whose indexed columns match `values`,
    * resolving partial keys to full keys through the index so BOTH the
    * resolution and the delete are bucket- and file-pruned — the
    * index-backed replacement for [[KeyedTable.delete]]'s partial-key
    * path, which reads every live bucket. Syncs the index first, and
    * re-validates resolved rows against the base so a stale entry can
    * only cost an extra read, never a wrong delete. */
  def deleteByValues(idx: KeyedTable, base: KeyedTable, values: DataFrame): Long = {
    sync(idx, base)
    base.delete(lookup(idx, base, values)
      .select(base.meta.keys.map(col): _*).distinct())
  }
}
