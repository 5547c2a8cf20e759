package graft.streaming

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.store.{CommitLog, KeyedTable}

import java.nio.file.Files

/** The batch drain's log-derived fast path: per-commit change-row
  * counts recorded at write time (observed during the fused write, no
  * extra job) let `runIncremental` derive each step's microbatch
  * profile — pins, row counts, delete flags — from the commit log, so
  * the per-step pin/count job disappears entirely.
  */
class DrainFastPathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String = Files.createTempDirectory("gfp").toString

  private def assertSameRows(got: DataFrame, want: DataFrame, ctx: String): Unit = {
    val cols = want.columns.sorted.toSeq
    val g = got.select(cols.map(col): _*)
    val w = want.select(cols.map(col): _*)
    assert(g.exceptAll(w).count() == 0 && w.exceptAll(g).count() == 0, ctx)
  }

  test("commits record exact per-change-type cdf row counts") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").limit(500)
    val t = KeyedTable.create(spark, s"$root/t", oDf.schema, Seq("o_orderkey"),
      numBuckets = 4)
    t.upsert(oDf, uniqueKeys = true)                                 // v1: inserts
    t.upsert(oDf.limit(100).withColumn("o_totalprice", lit(1.0)),
      uniqueKeys = true)                                             // v2: updates
    t.delete(oDf.limit(20).select("o_orderkey"))                     // v3: deletes
    val log = new CommitLog(s"$root/t", spark.sessionState.newHadoopConf())
    (1L to 3L).foreach { v =>
      val c = log.readCommit(v)
      assert(c.cdfUp >= 0 && c.cdfDel >= 0, s"v$v has no recorded counts")
      val cdf = t.changesSince(v - 1).where(col("_commit_version") === v)
      val up = cdf.where(col("_change_type") =!= "delete" &&
        col("_change_type") =!= "update_preimage").count()
      val del = cdf.where(col("_change_type") === "delete").count()
      assert(c.cdfUp == up, s"v$v cdfUp ${c.cdfUp} != $up")
      assert(c.cdfDel == del, s"v$v cdfDel ${c.cdfDel} != $del")
    }
    // 500 inserts + 100 update postimages = 600 up; 100 preimages; 20 deletes
    assert(log.cdfCountsBetween(0L, 3L).contains((600L, 20L, 100L, 3)))
  }

  test("drained join pipeline runs no pin job and matches the batch fixpoint") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema,
      Seq("o_orderkey"), numBuckets = 8)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema,
      Seq("c_custkey"), numBuckets = 8)
    val pipe = Stream.fromKeyedTable(oT)
      .join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")

    val descriptions = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = js.properties.getProperty("spark.job.description")
        if (d != null) descriptions.add(d)
      }
    }
    cT.upsert(cDf, uniqueKeys = true)
    oT.upsert(oDf.where(col("o_orderkey") % 2 === 0), uniqueKeys = true)
    spark.sparkContext.addSparkListener(listener)
    try {
      pipe.runIncremental()
      oT.upsert(oDf.where(col("o_orderkey") % 2 === 1), uniqueKeys = true)
      pipe.runIncremental()
      Thread.sleep(500) // let the async listener bus drain
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(!descriptions.contains("graft:join:pin"),
      s"drain ran a pin job; saw: $descriptions")

    val out = KeyedTable.forPath(spark, s"$root/out")
    val want = oT.snapshot()
      .join(cT.snapshot(), col("o_custkey") === col("c_custkey"), "inner")
    assertSameRows(out.snapshot().select(want.columns.map(col): _*), want,
      "drained join != batch join")
  }

  test("count-less commits (pre-recording format) fall back to the pin job") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").limit(300)
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema,
      Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema,
      Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf, uniqueKeys = true)
    oT.upsert(oDf, uniqueKeys = true)
    // strip the recorded counts from the orders commit — simulating a
    // table written before count recording existed
    val cf = new java.io.File(s"$root/orders/_log").listFiles()
      .filter(f => f.getName.endsWith(".json") && !f.getName.startsWith("_")).head
    val json = new String(java.nio.file.Files.readAllBytes(cf.toPath), "UTF-8")
    java.nio.file.Files.write(cf.toPath,
      json.replaceAll(""","cdfUp":\d+,"cdfDel":\d+""", "").getBytes("UTF-8"))
    new java.io.File(cf.getParent, s".${cf.getName}.crc").delete() // hadoop checksum sidecar
    // fresh handles AFTER the surgery: the writer's own handle has the
    // counts cached (commit files are immutable in real deployments)
    val pipe = Stream.fromPath(spark, s"$root/orders")
      .join(Stream.fromPath(spark, s"$root/customer"), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")

    val descriptions = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = js.properties.getProperty("spark.job.description")
        if (d != null) descriptions.add(d)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      pipe.runIncremental()
      Thread.sleep(500) // async listener bus
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(descriptions.contains("graft:join:pin"),
      "count-less window must take the pin-job fallback")
    val out = KeyedTable.forPath(spark, s"$root/out")
    val want = oT.snapshot()
      .join(cT.snapshot(), col("o_custkey") === col("c_custkey"), "inner")
    assertSameRows(out.snapshot().select(want.columns.map(col): _*), want,
      "fallback drain != batch join")
  }

  test("a layout-only commit window drains as a filesystem no-op") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").limit(200)
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema,
      Seq("o_orderkey"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(oT)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"))
      .writeToPath(s"$root/out")
    oT.upsert(oDf, uniqueKeys = true)
    pipe.runIncremental()
    val out = KeyedTable.forPath(spark, s"$root/out")
    val vBefore = out.latestVersion
    oT.optimize(Seq("o_custkey")) // layout-only: no cdf rows
    pipe.runIncremental()         // window holds only the optimize commit
    assert(out.latestVersion == vBefore,
      "layout-only window wrote a commit downstream")
    assertSameRows(out.snapshot().select("o_custkey", "cnt"),
      oT.snapshot().groupBy("o_custkey").agg(count(lit(1)).as("cnt")),
      "agg drifted after layout-only drain")
  }
}
