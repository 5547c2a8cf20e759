package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.KeyedTable

/** A column reference tied to one side of a join — the reference's
  * ColumnSelector (streams.py:11-65). Obtained via `stream("col")`;
  * `.alias` / `.to` carry a column transform into `select("*", …)`
  * (streams.py:33-41).
  */
final case class ColumnSel(owner: Stream, name: String,
    xform: Column => Column = identity) {
  def alias(newName: String): ColumnSel =
    copy(xform = c => xform(c).alias(newName))
  def to(f: Column => Column): ColumnSel =
    copy(xform = c => f(xform(c)))
  private[streaming] def apply(c: Column): Column = xform(c)
}

/** The user-facing incremental-stream API, mirroring the reference's
  * `Stream` (streams.py:96-240) on graft's KeyedTable CDF instead of
  * Delta CDF.
  *
  * {{{
  * val t = Stream.fromPath(spark, txnPath).primaryKeys("id").sequenceBy("ts")
  * val c = Stream.fromPath(spark, custPath).primaryKeys("cid")
  * val q = t.join(c, "left").on((l, r) => l("cust_id") === r("cid"))
  *   .writeToPath(outPath).start()
  * }}}
  */
final class Stream private (
    val spark: SparkSession,
    val table: KeyedTable,
    val pks: Seq[String],
    val seqCols: Seq[String],
    transform: DataFrame => DataFrame,
    private[streaming] val upstream: Seq[StageHandle],
    val maxFilesPerTrigger: Int,
    private val others: Seq[Stream] = Nil,
    private val startV: Long = -1L,
    private[streaming] val deletesOn: Boolean = false,
    private val maxBytes: Long = 1L << 30,
    private[streaming] val hasTransform: Boolean = false,
    private[streaming] val deletesAuto: Boolean = false) {

  def primaryKeys(keys: String*): Stream = copy(pks2 = keys)
  def sequenceBy(cols: String*): Stream = copy(seq2 = cols)

  /** Byte budget per microbatch over the change feed — the reference's
    * `maxBytesPerTrigger=1g` (streams.py:128), measured against the
    * commits' recorded cdf sizes. Default 1 GiB. */
  def maxBytesPerTrigger(bytes: Long): Stream = copy(maxBytes2 = bytes)

  /** Keys that may be NULL in this stream's rows — for a staged join
    * output, the outer side's keys (the table's declared nullableKeys).
    * Downstream joins must keep treating them as nullable: a chained
    * stage that bucketed on an upstream-nullable key would never match
    * its placeholder rows (the reference carries the same split through
    * chains, joins.py:804-810). */
  private[streaming] def nullablePks: Seq[String] =
    table.meta.nullableKeys.filter(pks.contains)

  /** Opt into delete propagation: `delete` change rows stay in the
    * feed and downstream stages retract — inner-join stages remove the
    * affected output rows, agg stages subtract the deleted rows'
    * contributions. The reference silently drops deletes
    * (streams.py:132); that remains the default here. */
  def handleDeletes(on: Boolean = true): Stream = copy(deletes2 = on, auto2 = false)

  /** Delete propagation enabled by the ENGINE on an internally staged
    * stream (a managed stage output feeding the next stage): the
    * upstream stage's own retraction machinery (join-key migration,
    * delete propagation, emptied-group removal) emits delete change
    * rows that downstream stages must keep applying even when the user
    * never opted sources into handleDeletes — dropping them would
    * strand the retracted rows one stage down. Unlike a user opt-in
    * this does NOT statically require both sides' pks in the next
    * stage's output; the stage fails loudly at runtime only if delete
    * rows actually arrive and cannot be resolved. */
  private[streaming] def handleDeletesAuto(): Stream =
    if (deletesOn) this else copy(deletes2 = true, auto2 = true)

  /** Source transform applied to both the change stream and the static
    * snapshot (streams.py:235-240). */
  def to(f: DataFrame => DataFrame): Stream =
    copy(transform2 = df => f(transform(df)), hasTransform2 = true)

  def apply(colName: String): ColumnSel = ColumnSel(this, colName)

  /** Union of two streams over same-schema keyed tables: the change
    * feed is the union of both feeds and every snapshot is the union
    * of both snapshots (joins.py:861-865 re-expressed at the stream
    * level). Primary keys must be disjoint-or-identical across inputs
    * for downstream merges to stay well-defined. */
  def union(other: Stream): Stream = copy(others2 = others :+ other)

  /** Change feed starts after this version (streams.py:127
    * `startingVersion`); -1 = from the beginning. */
  def startingVersion(v: Long): Stream = copy(startV2 = v)

  /** CDF rows as a streaming DataFrame; deletes are filtered like the
    * reference's fromPath (streams.py:132). */
  private[streaming] def changeStream: DataFrame = {
    val raw0 = table.changeStream(maxFilesPerTrigger, maxBytes)
    val raw = if (deletesOn) raw0 else raw0.where(col("_change_type") =!= "delete")
    val cut = if (startV < 0) raw else raw.where(col("_commit_version") > startV)
    val own = applyTransformKeepingCdf(cut)
    others.foldLeft(own)((acc, o) => acc.unionByName(o.changeStream))
  }

  /** Every keyed table feeding this stream (union members included) —
    * the version vector a batch-incremental drain tracks. */
  private[streaming] def allTables: Seq[KeyedTable] =
    table +: others.flatMap(_.allTables)

  /** Batch analog of [[changeStream]]: all change rows past the given
    * per-table high-water marks (and, when a drain byte budget splits
    * the backlog, at or below the `upTo` marks), with the same delete
    * filtering and source transform. One plain pruned cdf scan — no
    * streaming query, no checkpoint (`Pipeline.runIncremental`). */
  private[streaming] def changesBatch(after: String => Long,
      upTo: String => Long = _ => Long.MaxValue): DataFrame = {
    val raw1 = table.changesSince(after(table.path))
    val hi = upTo(table.path)
    val raw0 = if (hi == Long.MaxValue) raw1
               else raw1.where(col("_commit_version") <= hi)
    val raw = if (deletesOn) raw0 else raw0.where(col("_change_type") =!= "delete")
    val cut = if (startV < 0) raw else raw.where(col("_commit_version") > startV)
    val own = applyTransformKeepingCdf(cut)
    others.foldLeft(own)((acc, o) => acc.unionByName(o.changesBatch(after, upTo)))
  }

  /** This stream's change-row profile `(upserts, deletes, preimages,
    * contributing commits)` over a drain window, derived from the
    * source tables' commit-log counts — the log-side twin of counting
    * [[changesBatch]]'s rows with a Spark job. Row counts are upper
    * bounds when a `.to` transform filters rows (safe: callers use the
    * counts to SKIP work only at zero, and a transform cannot introduce
    * duplicate keys into a single commit's feed). None if any window
    * commit predates count recording. */
  private[streaming] def logCounts(after: String => Long,
      upTo: String => Long): Option[(Long, Long, Long, Int)] = {
    val own = table.changeCountsBetween(
      math.max(after(table.path), startV), upTo(table.path))
      // a deletes-off stream filters delete rows out of its feed;
      // preimages flow either way
      .map { case (u, d, pre, n) => if (deletesOn) (u, d, pre, n) else (u, 0L, pre, n) }
    others.foldLeft(own) { (acc, o) =>
      for (a <- acc; b <- o.logCounts(after, upTo))
        yield (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4)
    }
  }

  /** Static snapshot pinned at a version (streams.py:203-208). For a
    * unioned stream the pin applies to the primary table; union members
    * snapshot at their own latest. */
  private[streaming] def static(version: Long = -1L): DataFrame = {
    val own = transform(table.snapshot(version))
    others.foldLeft(own)((acc, o) => acc.unionByName(o.static()))
  }

  private def applyTransformKeepingCdf(df: DataFrame): DataFrame = {
    val t = transform(df.drop("_change_type", "_commit_version"))
    // re-attach CDF meta: run transform on the full frame if it survives,
    // else fall back to transforming data cols only. Transforms here are
    // renames/withColumn (streams.py usage), which preserve extra cols.
    val full = transform(df)
    if (full.columns.contains("_change_type") && full.columns.contains("_commit_version")) full
    else t.withColumn("_change_type", lit("insert")).withColumn("_commit_version", lit(0L))
  }

  def columns: Seq[String] =
    static().columns.toSeq

  def join(right: Stream, joinType: String = "inner"): JoinBuilder =
    new JoinBuilder(this, right, joinType)

  def groupBy(cols: String*): AggBuilder = new AggBuilder(this, cols)

  /** Root for auto-generated staging tables of chained stages. */
  private[streaming] def stagingRoot: String = {
    val p = new org.apache.hadoop.fs.Path(table.path)
    p.getParent.toString
  }

  /** True when this stream's static snapshot is exactly its table's
    * snapshot: no source transform and no union members — the shape
    * under which a join merge may swap the full static scan for a
    * bucket-pruned point read of the table. */
  private[streaming] def isPlainTable: Boolean = !hasTransform && others.isEmpty

  private def copy(
      pks2: Seq[String] = pks,
      seq2: Seq[String] = seqCols,
      transform2: DataFrame => DataFrame = transform,
      upstream2: Seq[StageHandle] = upstream,
      mft2: Int = maxFilesPerTrigger,
      others2: Seq[Stream] = others,
      startV2: Long = startV,
      deletes2: Boolean = deletesOn,
      maxBytes2: Long = maxBytes,
      hasTransform2: Boolean = hasTransform,
      auto2: Boolean = deletesAuto): Stream =
    new Stream(spark, table, pks2, seq2, transform2, upstream2, mft2, others2,
      startV2, deletes2, maxBytes2, hasTransform2, auto2)

  private[streaming] def withUpstream(h: Seq[StageHandle]): Stream = copy(upstream2 = h)
}

object Stream {
  def fromPath(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 64): Stream =
    fromKeyedTable(KeyedTable.forPath(spark, path), maxFilesPerTrigger)

  /** The reference's `Stream.fromTable(name)` (streams.py:96-124) on a
    * [[graft.store.TableCatalog]] name binding. */
  def fromTable(catalog: graft.store.TableCatalog, name: String,
      maxFilesPerTrigger: Int = 64): Stream =
    fromKeyedTable(catalog.table(name), maxFilesPerTrigger)

  def fromKeyedTable(kt: KeyedTable, maxFilesPerTrigger: Int = 64): Stream =
    new Stream(kt.spark, kt, kt.meta.keys, kt.meta.seqCols, identity, Nil, maxFilesPerTrigger)
}
