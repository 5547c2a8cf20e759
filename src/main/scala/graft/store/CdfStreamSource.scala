package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.StreamShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Log-indexed change-feed streaming source for a [[KeyedTable]] — the
  * streaming twin of `changesSince` and the analog of the reference's
  * Delta-log-indexed `readChangeFeed` stream (streams.py:126-144).
  *
  * Offsets ARE commit versions: `LongOffset(v)` means "all change rows
  * of commits ≤ v emitted". Each trigger maps its `(start, end]` window
  * to cdf directories through the cached commit log, so a 1-commit
  * trigger on a 10k-commit table touches ONE directory — the cdf-glob
  * file source it replaces re-listed every retained change file on
  * every trigger, O(retained files) forever.
  *
  * Trigger sizing is byte-budgeted like the reference's
  * `maxBytesPerTrigger=1g` (streams.py:128): the window grows until the
  * commits' recorded cdf byte sizes exceed `maxBytesPerTrigger` or the
  * commit count hits `maxCommitsPerTrigger`, always admitting at least
  * one commit so oversized commits still drain.
  *
  * Implements [[SupportsTriggerAvailableNow]] (the same shape as the
  * reference stack's Delta source): without it Spark downgrades
  * `Trigger.AvailableNow` on a V1 source to SINGLE-batch execution, in
  * which the one `getOffset` call is capped by the trigger budgets and
  * the run terminates with the rest of the backlog silently unprocessed.
  * With it, an availableNow run pins the end bound at start and drains
  * the whole backlog as a sequence of budget-sized microbatches.
  */
final class CdfStreamSource(
    sqlContext: SQLContext,
    tablePath: String,
    startingVersion: Long,
    maxCommitsPerTrigger: Int,
    maxBytesPerTrigger: Long) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val spark = sqlContext.sparkSession
  private val log = new CommitLog(tablePath, spark.sessionState.newHadoopConf())
  override val schema: StructType = KeyedTable.forPath(spark, tablePath).cdfSchema

  // commits ≤ floor0 are never emitted (startingVersion is inclusive)
  private val floor0 = startingVersion - 1
  // highest version already handed to the engine via getOffset/getBatch;
  // monotone — a restart re-seeds it from the checkpoint through getBatch
  @volatile private var planned: Long = floor0

  // fixed end of an availableNow run: captured ONCE at query start so
  // the run terminates even while writers keep committing
  @volatile private var availableNowBound: Long = Long.MaxValue

  private def ver(o: OffsetV2): Long = o match {
    case l: LongOffset      => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other               => other.json().trim.toLong
  }

  /** Budgeted window end over `(fromExclusive, min(latest, bound)]`;
    * sizes come from the cached commit parses — no filesystem access
    * beyond the log listing. Always admits ≥ 1 commit (progress for
    * oversized commits). */
  private def budgetedEnd(fromExclusive: Long): Long = {
    val latest = math.min(log.latestVersion(), availableNowBound)
    if (latest <= fromExclusive) return fromExclusive
    var end = fromExclusive; var n = 0; var bytes = 0L
    log.cdfBytesByVersion(fromExclusive, latest).foreach { case (v, b) =>
      val sz = math.max(b, 0L) // -1 = size unrecorded (legacy commit)
      if (n == 0 || (n < maxCommitsPerTrigger && bytes + sz <= maxBytesPerTrigger)) {
        end = v; n += 1; bytes += sz
      }
    }
    end
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = log.latestVersion()

  // budgets are commit/byte-based graft options, applied inside
  // budgetedEnd — the engine-side row/file limits don't map onto them
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control twin of [[getOffset]]: the engine passes the
    * restart's committed offset as `startOffset` (null on a fresh
    * start), which re-seeds `planned` past the checkpoint. */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = math.max(planned, Option(startOffset).map(ver).getOrElse(floor0))
    planned = math.max(from, budgetedEnd(from))
    if (planned > floor0) LongOffset(planned) else null
  }

  override def reportLatestOffset(): OffsetV2 = {
    val latest = log.latestVersion()
    if (latest > floor0) LongOffset(latest) else null
  }

  override def getOffset: Option[Offset] = {
    planned = math.max(planned, budgetedEnd(planned))
    if (planned > floor0) Some(LongOffset(planned)) else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = math.max(start.map(ver).getOrElse(floor0), floor0)
    val to = ver(end)
    planned = math.max(planned, to) // restart: re-seed past the checkpoint
    batchDf(from, to)
      .map(StreamShim.asStreamingBatch)
      .getOrElse(StreamShim.emptyStreamingBatch(spark, schema))
  }

  /** The window's change rows as a PLAIN batch read — the dir list is
    * what the O(1)-listing property is about, so specs inspect this
    * (a streaming-marked frame refuses batch execution/inputFiles). */
  private[store] def batchDf(fromExclusive: Long, toInclusive: Long)
      : Option[DataFrame] = {
    // a checkpoint window reaching below the truncation floor would
    // silently come back partial — fail loudly (same contract as
    // changesSince)
    require(fromExclusive >= log.floorForRead(fromExclusive),
      s"stream offset $fromExclusive is below the log truncation floor " +
        s"${log.truncationFloor} on $tablePath")
    val fs = new Path(tablePath).getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = log.versions().filter(v => v > fromExclusive && v <= toInclusive)
      .map(v => new Path(s"$tablePath/cdf/${log.dirOf(v)}"))
      .filter(fs.exists) // layout-only commits write no cdf
    if (dirs.isEmpty) None
    else Some(spark.read.schema(schema).parquet(dirs.map(_.toString): _*)
      // recovery may publish a pending dir holding superseded rows; the
      // version column stays authoritative (same guard as changesSince)
      .where(col("_commit_version") > fromExclusive &&
        col("_commit_version") <= toInclusive))
  }

  override def stop(): Unit = ()

  override def toString: String = s"CdfStreamSource[$tablePath]"
}

/** `spark.readStream.format("graft-cdf").load(tablePath)`.
  *
  * Options: `startingVersion` (inclusive, default 1 = everything),
  * `maxCommitsPerTrigger` (default 64), `maxBytesPerTrigger` (default
  * 1 GiB of recorded cdf bytes).
  */
final class CdfSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdf"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("graft-cdf requires a table path: .load(<table root>)"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val p = tablePath(parameters)
    (s"graft-cdf:$p",
      KeyedTable.forPath(sqlContext.sparkSession, p).cdfSchema)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new CdfStreamSource(
      sqlContext,
      tablePath(parameters),
      startingVersion = parameters.get("startingVersion").map(_.toLong).getOrElse(1L),
      maxCommitsPerTrigger =
        parameters.get("maxCommitsPerTrigger").map(_.toInt).getOrElse(64),
      maxBytesPerTrigger =
        parameters.get("maxBytesPerTrigger").map(_.toLong).getOrElse(1L << 30))
}
