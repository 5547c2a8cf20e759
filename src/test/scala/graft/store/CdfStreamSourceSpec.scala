package graft.store

import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import java.nio.file.Files

/** The log-indexed CDF streaming source (CdfStreamSource): offsets are
  * commit versions, a trigger lists only its window's cdf dirs, and
  * trigger sizing is byte-budgeted — the scale properties the cdf-glob
  * file source it replaced lacked.
  */
class CdfStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("cdfsrc").toString

  private def tableWithCommits(n: Int, rowsPer: Int = 5): KeyedTable = {
    val t = tmp()
    val schema = Seq((1L, 0.0)).toDF("id", "v").schema
    val kt = KeyedTable.create(spark, t, schema, keys = Seq("id"), numBuckets = 4)
    (1 to n).foreach { c =>
      val base = c * 1000L
      kt.upsert((0 until rowsPer).map(i => (base + i, c.toDouble)).toDF("id", "v"),
        uniqueKeys = true)
    }
    kt
  }

  test("streamed change feed equals the batch change feed") {
    val kt = tableWithCommits(6)
    val name = s"cdf_src_${System.nanoTime()}"
    val q = kt.changeStream(maxCommitsPerTrigger = 2)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name)
      .select("id", "v", "_change_type", "_commit_version")
      .collect().map(_.toSeq).toSet
    val batch = kt.changesSince(0L)
      .select("id", "v", "_change_type", "_commit_version")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("a 1-commit trigger on a many-commit table reads O(1) dirs") {
    val kt = tableWithCommits(30)
    val latest = kt.latestVersion
    val src = new CdfStreamSource(spark.sqlContext, kt.path,
      startingVersion = 1L, maxCommitsPerTrigger = 64,
      maxBytesPerTrigger = 1L << 30)
    // the tail commit alone: (latest-1, latest]
    val batch = src.batchDf(latest - 1, latest).get
    val dirs = batch.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(dirs.length == 1,
      s"1-commit trigger listed ${dirs.length} cdf dirs: ${dirs.take(5).mkString(",")}")
    // and it is exactly the tail commit's own cdf dir
    assert(dirs.head.endsWith(s"/cdf/${kt.dataDirOf(latest)}"),
      s"not the tail commit's dir: ${dirs.head}")
    // the version-window filter reaches the parquet scan (row-group
    // skipping on _commit_version), it is not a post-scan residual only
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("_commit_version"),
      s"version window not pushed to the scan:\n${plan.take(800)}")
  }

  test("getOffset advances by the commit-count budget") {
    val kt = tableWithCommits(5)
    // budget of 2 over 5 commits: 2, 4, then 5
    val o1 = new CdfStreamSource(spark.sqlContext, kt.path, 1L, 2, 1L << 30)
    assert(o1.getOffset.get.asInstanceOf[LongOffset].offset == 2L)
    assert(o1.getOffset.get.asInstanceOf[LongOffset].offset == 4L)
    assert(o1.getOffset.get.asInstanceOf[LongOffset].offset == 5L)
    // drained: offset stays put
    assert(o1.getOffset.get.asInstanceOf[LongOffset].offset == 5L)
  }

  test("getOffset honors the byte budget but always admits one commit") {
    val kt = tableWithCommits(4, rowsPer = 50)
    // tiny byte budget: every commit's cdf exceeds it, so each trigger
    // still takes exactly one commit (oversized commits must drain)
    val src = new CdfStreamSource(spark.sqlContext, kt.path,
      startingVersion = 1L, maxCommitsPerTrigger = 64,
      maxBytesPerTrigger = 1L)
    assert(src.getOffset.get.asInstanceOf[LongOffset].offset == 1L)
    assert(src.getOffset.get.asInstanceOf[LongOffset].offset == 2L)
  }

  test("startingVersion skips earlier commits") {
    val kt = tableWithCommits(6)
    val name = s"cdf_sv_${System.nanoTime()}"
    val q = spark.readStream.format("graft-cdf")
      .option("startingVersion", 4).load(kt.path)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val versions = spark.table(name).select("_commit_version")
      .distinct().as[Long].collect().sorted.toSeq
    assert(versions == Seq(4L, 5L, 6L))
  }

  test("checkpoint restart resumes at the recorded version, no re-read") {
    val kt = tableWithCommits(4)
    val ckpt = tmp()
    val out = tmp() + "/out" // parquet sink: memory sink can't recover
    def run(): Unit = {
      val q = kt.changeStream()
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val firstRun = spark.read.parquet(out).count()
    assert(firstRun == 20L) // 4 commits × 5 rows
    // new commits land while the stream is DOWN
    kt.upsert(Seq((70001L, 7.1), (70002L, 7.2)).toDF("id", "v"),
      uniqueKeys = true)
    kt.upsert(Seq((70003L, 7.3)).toDF("id", "v"), uniqueKeys = true)
    run()
    // the restarted query recovered its offset (a SerializedOffset fed
    // back through getBatch) and appended ONLY the two missed commits
    val after = spark.read.parquet(out)
      .where(col("_commit_version") > 4)
      .select("id", "_commit_version")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(after == Set(70001L -> 5L, 70002L -> 5L, 70003L -> 6L),
      s"restart re-read or skipped commits: $after")
    assert(spark.read.parquet(out).count() == 23L, "duplicate rows appended")
  }

  // availableNow economics: the source implements
  // SupportsTriggerAvailableNow, so Spark's MicroBatchExecution runs it
  // as a MULTI-batch drain to a pinned bound instead of the V1 fallback
  // ("Falling back to single batch execution"), whose one getOffset call
  // would be capped by the trigger budgets and leave the rest of the
  // backlog silently unprocessed.
  private def runAvailableNow(kt: KeyedTable, commitsPer: Int): (Int, Long) = {
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = kt.changeStream(maxCommitsPerTrigger = commitsPer)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.incrementAndGet(); rows.addAndGet(df.count()); ()
      }
      .option("checkpointLocation", tmp())
      .start()
    assert(q.awaitTermination(180000), "availableNow run did not terminate")
    (batches.get(), rows.get())
  }

  test("availableNow coalesces a 30-commit backlog under default budgets") {
    val kt = tableWithCommits(30)
    val (batches, rows) = runAvailableNow(kt, commitsPer = 64)
    assert(rows == 150L, s"availableNow dropped rows: $rows of 150")
    assert(batches <= 2, s"backlog fragmented into $batches microbatches")
  }

  test("availableNow drains the FULL backlog in budget-sized microbatches") {
    val kt = tableWithCommits(30)
    val (batches, rows) = runAvailableNow(kt, commitsPer = 8)
    // before SupportsTriggerAvailableNow this was (1, 40): the single
    // fallback batch took one 8-commit budget window and terminated
    assert(rows == 150L, s"availableNow dropped rows: $rows of 150")
    assert(batches == 4, s"expected ceil(30/8)=4 budgeted microbatches, got $batches")
  }

  test("stream picks up commits landed while running") {
    val kt = tableWithCommits(2)
    val name = s"cdf_live_${System.nanoTime()}"
    val q = kt.changeStream()
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      val before = spark.table(name).count()
      kt.upsert(Seq((99999L, 9.9)).toDF("id", "v"), uniqueKeys = true)
      q.processAllAvailable()
      assert(spark.table(name).count() == before + 1)
    } finally q.stop()
  }
}
