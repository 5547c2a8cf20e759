package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiler: wall time, Spark job counts, and per-job-description
  * time for any gate queries (`runMain graft.ProfCdc q1,q2` — defaults
  * to the CDC set). The merge hot path tags its jobs
  * (graft:merge:plan / graft:merge:write / graft:join:pin) so regressions
  * in per-commit job structure show up here first.
  */
object ProfCdc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.merge.shufflePartitions",
        sys.env.getOrElse("GRAFT_MERGE_PARTS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var jobMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val byDesc = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs += 1
        val d = Option(e.properties.getProperty("spark.job.description"))
          .orElse(Option(e.properties.getProperty("callSite.short"))).getOrElse("?")
        starts.put(e.jobId, (e.time, d.take(60)))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        if (s != null) {
          jobMs += e.time - s._1
          byDesc.merge(s._2, (1, e.time - s._1),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    })
    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs; val m0 = jobMs; val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name%-28s ${dt}%8.2fs jobs=${jobs - j0}%3d jobTime=${(jobMs - m0) / 1000.0}%7.2fs")
      r
    }
    // warm-up
    phase("warmup")(queries.Queries.all("agg_sum_groupby")(spark, sfDir).count())
    for (q <- args.headOption.toSeq.flatMap(_.split(',')).filter(_.nonEmpty) match {
      case Nil => Seq("cdc_upsert_snapshot", "cdc_join_incremental", "cdc_agg_reduce_incremental")
      case xs => xs
    }) {
      byDesc.clear()
      phase(q)(SparkEntry.queries(q)(spark, sfDir).count())
      import scala.jdk.CollectionConverters._
      byDesc.asScala.toSeq.sortBy(-_._2._2).take(12).foreach { case (d, (n, ms)) =>
        println(f"    $n%3d× ${ms / 1000.0}%7.2fs  $d")
      }
    }
    spark.stop()
  }
}
