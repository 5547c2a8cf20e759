package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE gate query by name against an sf dir and print
  * its row count (and optionally the rows) — fast single-query
  * iteration without a full Verify pass.
  *
  * {{{ sbt "runMain graft.DevRun agg_stream_complex /root/testdata/sf0.001 show" }}}
  */
object DevRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.merge.shufflePartitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"[devrun] $name rows=${df.count()}")
    if (args.contains("show")) df.show(50, truncate = false)
    if (args.contains("explain")) df.explain("formatted")
    spark.stop()
  }
}
