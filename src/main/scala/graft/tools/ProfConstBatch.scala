package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The 100 TB plan-cost prediction, tested directly (SURVEY §6s-4 /
  * r12 verdict #3): per-commit drain cost is claimed FLAT in total
  * data volume as long as byte-budgeted drains hold per-sub-batch
  * bytes constant — growth in the r12 sf1 profile's plan phase was
  * the staged-batch collect, which is batch-bytes-proportional, not
  * history- or table-size-proportional.
  *
  * The bench gates can't test that claim: they seed each source with
  * ONE fat upsert, and a byte budget can never split below commit
  * granularity. This probe seeds a stream-stream join source with
  * MANY fixed-row-count commits (so per-commit bytes are constant
  * across scale factors by construction), drains once under a pinned
  * `spark.graft.drain.maxBytes`, and prints per-phase totals and the
  * output commit count. Run at two scales with identical chunkRows
  * and budget: the prediction is plan/write seconds PER COMMIT stay
  * ~flat while the commit count scales with the data.
  *
  * Usage: ProfConstBatch <sfDir> [chunkRows=50000] [budgetBytes=3000000]
  */
object ProfConstBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val chunkRows = if (args.length > 1) args(1).toLong else 50000L
    val budget = if (args.length > 2) args(2).toLong else 3000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.merge.shufflePartitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, chunkRows, budget) finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, chunkRows: Long,
      budget: Long): Unit = {
    import graft.store.{KeyedTable, PhaseStats}
    import graft.streaming.Stream
    val root = java.nio.file.Files
      .createTempDirectory("graft-constbatch").toString
    val cDf = graft.Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_name")
    val oDf = graft.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey").alias("c_custkey"),
        col("o_totalprice"))
    val nOrders = oDf.count()
    val nChunks = math.max(1L, (nOrders + chunkRows - 1) / chunkRows).toInt
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema,
      Seq("c_custkey"), numBuckets = 8)
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema,
      Seq("o_orderkey"), numBuckets = 8)
    val pipe = Stream.fromKeyedTable(cT)
      .join(Stream.fromKeyedTable(oT), "inner").onKeys("c_custkey")
      .writeToPath(s"$root/out")
    // seed: the dim side as one commit, the fact side as nChunks
    // commits of ~chunkRows rows each — constant per-commit bytes
    // across scale factors by construction
    cT.upsert(cDf, uniqueKeys = true)
    val chunked = oDf.withColumn("__chunk",
      pmod(col("o_orderkey"), lit(nChunks.toLong)).cast("int")).cache()
    chunked.count()
    (0 until nChunks).foreach { i =>
      oT.upsert(chunked.where(col("__chunk") === i).drop("__chunk"),
        uniqueKeys = true)
    }
    chunked.unpersist()
    // measured region: ONE byte-budgeted drain over the whole backlog
    PhaseStats.reset()
    spark.conf.set("spark.graft.drain.maxBytes", budget.toString)
    val t0 = System.nanoTime()
    try pipe.runIncremental()
    finally spark.conf.unset("spark.graft.drain.maxBytes")
    val wall = (System.nanoTime() - t0) / 1e9
    val out = KeyedTable.forPath(spark, s"$root/out")
    val commits = out.latestVersion
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val ph = PhaseStats.snapshot().toSeq.sortBy(_._1)
      .map { case (k, (n, s)) => "\"" + k + "\":[" + n + "," + fmt(s) + "]" }
      .mkString("{", ",", "}")
    val sfName = new java.io.File(sfDir).getName
    println(s"""{"probe":"const_batch","sf":"$sfName","orders":$nOrders,""" +
      s""""chunkRows":$chunkRows,"srcCommits":$nChunks,"budget":$budget,""" +
      s""""outCommits":$commits,"wall":${fmt(wall)},"phases":$ph}""")
  }
}
