package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import scala.collection.mutable
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val gate = if (args.nonEmpty) args(0) else "cdc_join_incremental"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.graft.merge.shufflePartitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = mutable.Map[String, (Int, Long)]().withDefaultValue((0, 0L))
    val starts = mutable.Map[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties.getProperty("spark.job.description")).getOrElse("none")
        starts(j.jobId) = (d, System.nanoTime())
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (d, t0) =>
          val (c, t) = counts(d)
          counts(d) = (c + 1, t + (System.nanoTime() - t0))
        }
    })
    val d = "/root/testdata/sf0.01"
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(gate)(spark, d).count()
    println(f"TOTAL: ${(System.nanoTime()-t0)/1e9}%.2f s")
    counts.toSeq.sortBy(-_._2._2).foreach { case (k, (c, t)) =>
      println(f"JOBS ${k.take(60)}%-60s n=$c%-4d ${t/1e9}%.2f s") }
    spark.stop()
  }
}
