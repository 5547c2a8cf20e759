package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import java.nio.file.Files

/** Incremental bucket-range optimize (SURVEY §6k-4): a 16-bucket table
  * optimized in 4-bucket claimed steps, each its own OCC commit, so a
  * 100 TB optimize never serializes the table behind one giant commit
  * and concurrent writers interleave freely.
  */
class IncrementalOptimizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("incopt").toString

  test("16 buckets in 4-bucket steps: four commits, content identical") {
    val t = tmp()
    val df = (1L to 2000L).map(i => (i, (i % 97).toDouble)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"),
      numBuckets = 16)
    kt.upsert(df, uniqueKeys = true)
    val before = kt.snapshot().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val v0 = kt.latestVersion
    val steps = kt.optimizeIncremental(Seq("v"), bucketsPerStep = 4)
    assert(steps == Seq(v0 + 1, v0 + 2, v0 + 3, v0 + 4),
      s"expected 4 consecutive step commits, got $steps")
    val after = kt.snapshot().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after == before)
    // each step's manifest covers ONLY its claimed bucket range
    val conf = spark.sessionState.newHadoopConf()
    val log = new CommitLog(t, conf)
    val perStep = steps.map(v => log.readCommit(v).files.get.keySet)
    assert(perStep.forall(_.forall(b => b >= 0 && b < 16)))
    assert(perStep.map(_.size).sum == 16,
      s"steps covered ${perStep.map(_.size).sum} buckets, want all 16")
    assert(perStep.flatten.toSet.size == 16, "step bucket ranges overlapped")
  }

  test("a writer racing a step's claim: step retries, content converges") {
    val t = tmp()
    val df = (1L to 1000L).map(i => (i, 1.0)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"),
      numBuckets = 16)
    kt.upsert(df, uniqueKeys = true)
    // an independent handle of the same table commits an upsert right
    // between a step's file write and its commit claim — the step MUST
    // lose the claim and replay against the writer's rows
    val rival = KeyedTable.forPath(spark, t)
    @volatile var fired = false
    kt.preCommitHook = () => if (!fired) {
      fired = true
      rival.upsert(
        Seq((1L, 99.0), (5000L, 50.0)).toDF("id", "v"), uniqueKeys = true)
    }
    try {
      val steps = kt.optimizeIncremental(Seq("v"), bucketsPerStep = 4)
      assert(steps.length == 4)
      assert(fired && kt.occRetries >= 1, "the race never fired")
    } finally kt.preCommitHook = () => ()
    val expect = (1L to 1000L).map(i => i -> (if (i == 1L) 99.0 else 1.0))
      .toMap + (5000L -> 50.0)
    val got = KeyedTable.forPath(spark, t).snapshot().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expect)
  }

  test("a concurrent rebucket aborts remaining steps cleanly") {
    val t = tmp()
    val df = (1L to 500L).map(i => (i, 1.0)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"),
      numBuckets = 16)
    kt.upsert(df, uniqueKeys = true)
    val rival = KeyedTable.forPath(spark, t)
    @volatile var fired = false
    kt.preCommitHook = () => if (!fired) { fired = true; rival.rebucket(32) }
    try {
      kt.optimizeIncremental(Seq("v"), bucketsPerStep = 4)
    } finally kt.preCommitHook = () => ()
    // whatever steps survived, the table reads exactly under the new modulus
    val got = KeyedTable.forPath(spark, t).snapshot().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == (1L to 500L).map(_ -> 1.0).toMap)
  }
}
