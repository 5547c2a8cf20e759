package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Writer configuration threaded into a stage at start time — the
  * reference's DataStreamWriter option/trigger/queryName surface
  * (streams.py:316-347).
  */
final case class WriterConf(
    options: Map[String, String] = Map.empty,
    trigger: Option[Trigger] = None,
    queryName: Option[String] = None)

/** One stage of a chained incremental pipeline: a named streaming query
  * writing a staged KeyedTable (the reference's dependent-query chain,
  * streams.py:316-359).
  */
final case class StageHandle(name: String, startFn: WriterConf => StreamingQuery,
    drainFn: () => Unit = () => throw new UnsupportedOperationException(
      "stage does not support incremental drain"))

/** An unstarted chain of streaming stages, upstream first. */
final class Pipeline(val handles: Seq[StageHandle]) {
  private var conf = WriterConf()

  /** Options apply to the terminal stage (e.g. checkpointLocation). */
  def option(key: String, value: String): Pipeline = {
    conf = conf.copy(options = conf.options + (key -> value))
    this
  }

  /** Trigger applies to every stage of the chain (streams.py:339-343). */
  def trigger(t: Trigger): Pipeline = {
    conf = conf.copy(trigger = Some(t))
    this
  }

  def queryName(name: String): Pipeline = {
    conf = conf.copy(queryName = Some(name))
    this
  }

  /** Starts every stage upstream-first (streams.py:353-359). */
  def start(): PipelineQuery = {
    val staged = handles.init.map(h =>
      h.name -> h.startFn(WriterConf(trigger = conf.trigger)))
    val terminal = handles.last
    new PipelineQuery(staged :+ (terminal.name -> terminal.startFn(conf)))
  }

  /** Batch-drain execution: each stage runs once with
    * `Trigger.AvailableNow`, upstream-first and SEQUENTIALLY — stage k
    * materializes its whole backlog (then stops) before stage k+1
    * starts, so one call cascades the full chain. Unlike a
    * continuously-triggered `start()`, a stage consumes its entire
    * pending commit range as one availableNow run instead of eagerly
    * chasing every upstream commit — far fewer microbatch merges for
    * the same result. Checkpoints persist between calls, so repeated
    * `runAvailableNow()` invocations are incremental: the deployment
    * shape for cron-style periodic pipelines (and how the driver-gate
    * feed waves are drained). */
  /** Checkpoint-FREE batch-incremental drain: each stage reads its
    * pending cdf commit range as ONE plain batch DataFrame (per-table
    * high-water marks in a tiny `_drain` state file, write-ahead-intent
    * crash recovery) and runs the same merge body the streaming path
    * runs — no StreamingQuery start/stop, no offset/commit WAL, no
    * file-source directory listing. Upstream-first like
    * [[runAvailableNow]]; a stage whose sources haven't moved is a pure
    * filesystem no-op. This is the cheapest cron-style deployment shape;
    * the exactly-once guarantee is the merge batchId marker, same as
    * streaming. Do NOT mix with checkpointed runs of the same pipeline:
    * each mode tracks progress on its own and would re- or skip-apply
    * the other's batches (the stage throws on a detected mix). */
  def runIncremental(): Unit = handles.foreach(_.drainFn())

  def runAvailableNow(): Unit = {
    val t = org.apache.spark.sql.streaming.Trigger.AvailableNow()
    handles.zipWithIndex.foreach { case (h, i) =>
      val wc =
        if (i == handles.size - 1) conf.copy(trigger = Some(t))
        else WriterConf(trigger = Some(t))
      val q = h.startFn(wc)
      q.awaitTermination()
    }
  }
}

/** Running pipeline — the reference's chained StreamingQuery wrapper
  * (streams.py:242-314).
  */
final class PipelineQuery(val queries: Seq[(String, StreamingQuery)]) {

  def isActive: Boolean = queries.exists(_._2.isActive)

  def lastProgress: Map[String, org.apache.spark.sql.streaming.StreamingQueryProgress] =
    queries.map { case (n, q) => n -> q.lastProgress }.toMap

  def recentProgress: Map[String, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]] =
    queries.map { case (n, q) => n -> q.recentProgress.toSeq }.toMap

  /** Drains the whole chain: one upstream-to-downstream pass moves each
    * stage's pending change files into the next stage's table; `rounds`
    * passes guarantee quiescence for a chain of ≤ `rounds` stages when
    * sources are idle (the reference polls progress metrics instead,
    * streams.py:285-310 — with availableNow-style local testing, ordered
    * passes are deterministic and faster). */
  def processAllAvailable(rounds: Int = 0): Unit = {
    val n = if (rounds > 0) rounds else math.max(queries.size, 1)
    (0 until n).foreach { _ =>
      queries.foreach { case (_, q) => q.processAllAvailable() }
    }
  }

  /** Progress-based drain for CONTINUOUSLY-triggered chains — the
    * reference's `awaitAllProcessed` (streams.py:285-310). Ordered
    * `processAllAvailable` passes assume each stage is idle once its
    * own pass returns; under a ProcessingTime trigger an upstream
    * commit can land mid-pass. This polls every stage's status and
    * returns once the whole chain has been quiet (no data available,
    * no trigger running) for `quietMs` — the reference's
    * shutdownLatencySecs; size it ≥ 2× the trigger interval.
    * Returns false on timeout. */
  def awaitAllProcessed(timeoutMs: Long = 120000L, quietMs: Long = 2000L): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var quietStart = -1L
    while (System.currentTimeMillis() < deadline) {
      val busy = queries.exists { case (_, q) =>
        q.isActive && (q.status.isDataAvailable || q.status.isTriggerActive)
      }
      if (busy) quietStart = -1L
      else {
        val now = System.currentTimeMillis()
        if (quietStart < 0) quietStart = now
        else if (now - quietStart >= quietMs) return true
      }
      Thread.sleep(50)
    }
    false
  }

  def awaitAllProcessedAndStop(timeoutMs: Long = 120000L, quietMs: Long = 2000L): Boolean = {
    val drained = awaitAllProcessed(timeoutMs, quietMs)
    stop()
    drained
  }

  def awaitTermination(timeoutMs: Long): Boolean =
    queries.map { case (_, q) => q.awaitTermination(timeoutMs) }.forall(identity)

  def stop(): Unit = queries.reverse.foreach(_._2.stop())

  def processAllAvailableAndStop(): Unit = {
    processAllAvailable()
    stop()
  }
}
