package graft.store

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Process-wide accumulator of engine phase wall-clock (merge plan /
  * write / stats / commit / publish, downgrade resolution, ...).
  * Always on — the per-call overhead is two nanoTime reads against
  * phases that each run Spark jobs — so a bench record carries its own
  * cost attribution instead of needing a forensic same-box A/B when a
  * loaded driver box swings individual gate timings. Thread-safe:
  * concurrent drainers/writers add to striped LongAdders.
  */
object PhaseStats {
  private val nanos = new ConcurrentHashMap[String, LongAdder]()
  private val counts = new ConcurrentHashMap[String, LongAdder]()

  def add(label: String, ns: Long): Unit = {
    nanos.computeIfAbsent(label, _ => new LongAdder()).add(ns)
    counts.computeIfAbsent(label, _ => new LongAdder()).increment()
  }

  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f finally add(label, System.nanoTime() - t0)
  }

  /** label -> (invocations, total seconds) */
  def snapshot(): Map[String, (Long, Double)] = {
    import scala.jdk.CollectionConverters._
    nanos.asScala.map { case (k, v) =>
      k -> (counts.get(k).sum(), v.sum() / 1e9)
    }.toMap
  }

  def reset(): Unit = { nanos.clear(); counts.clear() }
}
