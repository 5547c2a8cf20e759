package graft.tools

import org.apache.spark.sql.SparkSession

/** Interval-join flip-flop adjudication (r14 verdict #3): the two
  * stream-stream interval gates bounced 2.7 ↔ 6.1 s across r11-r14
  * with ZERO code changes on their path (git: EventOps.scala and the
  * OpsQueries interval entries last changed before r11; neither reads
  * the store, so no round's KeyedTable work can touch them). This tool
  * runs the interleaved A/B the verdict asked for — N alternating reps
  * of both gates in one Bench-configured JVM — and prints one JSON line
  * with per-rep wall seconds, so the record shows the distribution
  * (first-rep startup vs steady state) instead of a single sample.
  *
  * Usage: ABIntervalJoin [sfDir] [reps=6]
  */
object ABIntervalJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.merge.shufflePartitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up the bench runs, so rep 1 matches a bench-run gate
    graft.SparkEntry.queries.get("agg_sum_groupby").foreach(_(spark, sfDir).count())
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val gates = Seq(
      "stream_interval_join" -> (graft.queries.OpsQueries.streamIntervalJoin _),
      "stream_interval_left" -> (graft.queries.OpsQueries.streamIntervalJoinLeft _))
    val rows = (1 to reps).flatMap { rep =>
      gates.map { case (name, fn) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        (name, rep, sec, n)
      }
    }
    val byGate = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val secs = rs.sortBy(_._2).map(_._3)
      s""""$g":{"reps":[${secs.map(fmt).mkString(",")}],""" +
        s""""min":${fmt(secs.min)},"max":${fmt(secs.max)},""" +
        s""""rows":${rs.head._4}}"""
    }.mkString("{", ",", "}")
    val sfName = new java.io.File(sfDir).getName
    println(s"""{"probe":"ab_interval_join","sf":"$sfName","gates":$byGate}""")
    spark.stop()
  }
}
