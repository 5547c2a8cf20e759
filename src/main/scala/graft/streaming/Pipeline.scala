package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** One stage of a chained incremental pipeline: a named streaming query
  * writing a staged KeyedTable (the reference's dependent-query chain,
  * streams.py:316-359).
  */
final case class StageHandle(name: String, startFn: () => StreamingQuery)

/** An unstarted chain of streaming stages, upstream first. */
final class Pipeline(val handles: Seq[StageHandle]) {
  /** Starts every stage upstream-first (streams.py:353-359). */
  def start(): PipelineQuery =
    new PipelineQuery(handles.map(h => h.name -> h.startFn()))
}

/** Running pipeline — the reference's chained StreamingQuery wrapper
  * (streams.py:242-314).
  */
final class PipelineQuery(val queries: Seq[(String, StreamingQuery)]) {

  def isActive: Boolean = queries.exists(_._2.isActive)

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

  def stop(): Unit = queries.reverse.foreach(_._2.stop())

  def processAllAvailableAndStop(): Unit = {
    processAllAvailable()
    stop()
  }
}
