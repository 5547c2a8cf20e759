package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.store.KeyedTable

import java.nio.file.Files

/** `Pipeline.runIncremental` — the checkpoint-free batch drain — must
  * produce exactly the streaming result: same merges, same exactly-once
  * guarantees, none of the StreamingQuery machinery.
  */
class IncrementalDrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String = Files.createTempDirectory("gd").toString

  private def assertSameRows(got: DataFrame, want: DataFrame, ctx: String): Unit = {
    val cols = want.columns.sorted.toSeq
    val g = got.select(cols.map(col): _*)
    val w = want.select(cols.map(col): _*)
    val onlyGot = g.exceptAll(w).count()
    val onlyWant = w.exceptAll(g).count()
    assert(onlyGot == 0 && onlyWant == 0,
      s"$ctx: $onlyGot rows only in drained result, $onlyWant only in batch result")
  }

  test("chained join→agg pipeline drained incrementally equals the batch fixpoint") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 8)
    val pipe = Stream.fromKeyedTable(oT)
      .join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .groupByStaged(s"$root/stage", "c_custkey")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("total"))
      .writeToPath(s"$root/out")

    // wave 1: half the orders, all customers
    cT.upsert(cDf, uniqueKeys = true)
    oT.upsert(oDf.where(col("o_orderkey") % 2 === 0), uniqueKeys = true)
    pipe.runIncremental()
    // wave 2: the other half plus an update (pre-image retraction)
    oT.upsert(oDf.where(col("o_orderkey") % 2 === 1), uniqueKeys = true)
    oT.upsert(oDf.where(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2), uniqueKeys = true)
    pipe.runIncremental()

    val want = oT.snapshot()
      .join(cT.snapshot(), col("o_custkey") === col("c_custkey"), "inner")
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("total"))
    val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assertSameRows(got, want, "join→agg drain")

    // idle re-drain: no sources moved → no new versions anywhere
    val vOut = KeyedTable.forPath(spark, s"$root/out").latestVersion
    val vStage = KeyedTable.forPath(spark, s"$root/stage").latestVersion
    pipe.runIncremental()
    assert(KeyedTable.forPath(spark, s"$root/out").latestVersion == vOut &&
      KeyedTable.forPath(spark, s"$root/stage").latestVersion == vStage,
      "idle runIncremental must be a no-op")
  }

  test("a byte budget splits a multi-commit backlog into bounded sub-batches") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(oT)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("total"))
      .writeToPath(s"$root/out")
    // 4-commit backlog, then ONE runIncremental under a 1-byte budget:
    // every commit must become its own exactly-once merge
    (0 until 4).foreach(i =>
      oT.upsert(oDf.where(pmod(col("o_orderkey"), lit(4)) === i), uniqueKeys = true))
    spark.conf.set("spark.graft.drain.maxBytes", "1")
    try pipe.runIncremental()
    finally spark.conf.unset("spark.graft.drain.maxBytes")
    val out = KeyedTable.forPath(spark, s"$root/out")
    assert(out.latestVersion == 4L,
      s"want 4 budget-bounded merges, got ${out.latestVersion}")
    val got = out.snapshot()
    val want = oDf.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("total"))
    assertSameRows(got, want, "budgeted agg drain")
    // and an unbudgeted idle re-drain stays a no-op
    pipe.runIncremental()
    assert(KeyedTable.forPath(spark, s"$root/out").latestVersion == 4L)
  }

  test("byte-budgeted drain of a JOIN stage (two sources) stays correct") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/c", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(oT)
      .join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
    cT.upsert(cDf, uniqueKeys = true)
    (0 until 3).foreach(i =>
      oT.upsert(oDf.where(pmod(col("o_orderkey"), lit(3)) === i), uniqueKeys = true))
    spark.conf.set("spark.graft.drain.maxBytes", "1")
    try pipe.runIncremental()
    finally spark.conf.unset("spark.graft.drain.maxBytes")
    val out = KeyedTable.forPath(spark, s"$root/out")
    assert(out.latestVersion >= 3L, s"want >= 3 sub-batch merges, got ${out.latestVersion}")
    assertSameRows(out.snapshot(),
      oDf.join(cDf, col("o_custkey") === col("c_custkey"), "inner"),
      "budgeted join drain")
  }

  test("a stage with merge markers but no drain state refuses to drain") {
    // lost drain state (or a previously-checkpointed streaming run) is
    // indistinguishable from mode mixing: a naive full-range re-drain
    // would be marker-skipped INCLUDING any commits the last drain never
    // saw — silent data loss. The contract is refusal.
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val pipe = Stream.fromKeyedTable(oT)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("total"))
      .writeToPath(s"$root/out")
    oT.upsert(oDf, uniqueKeys = true)
    pipe.runIncremental()
    val st = new java.io.File(s"$root/out/_drain/state.properties")
    assert(st.exists); assert(st.delete())
    val e = intercept[IllegalArgumentException] { pipe.runIncremental() }
    assert(e.getMessage.contains("checkpointed-run history"))
  }

  test("a checkpointed streaming run over a drained stage is refused") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice").limit(50)
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(oT)
      .groupBy("o_orderkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("total"))
      .writeToPath(s"$root/out")
    oT.upsert(oDf, uniqueKeys = true)
    pipe.runIncremental()
    val e = intercept[IllegalArgumentException] { pipe.runAvailableNow() }
    assert(e.getMessage.contains("drained with runIncremental"))
    pipe.runIncremental() // drain mode keeps working
  }

  test("crash between intent and merge is re-drained; after merge is promoted") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .limit(100)
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(oT)
      .groupBy("o_orderkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("total"))
      .writeToPath(s"$root/out")
    oT.upsert(oDf, uniqueKeys = true)
    pipe.runIncremental()
    // simulate a crash AFTER the merge landed but BEFORE intent→state
    // promotion: recreate the intent for a hypothetical next drain whose
    // merge (batchId 1) never ran — load must discard it and re-drain
    val out = KeyedTable.forPath(spark, s"$root/out")
    DrainState.begin(spark, s"$root/out/_drain",
      DrainState.St(Map("bogus" -> 99L), next = 99L))
    // applied batchId is 0 < 99-1 → intent discarded, prior state kept
    val loaded = DrainState.load(spark, s"$root/out/_drain", out.lastAppliedBatchId)
    assert(loaded.next == 1L && !loaded.versions.contains("bogus"),
      s"unlanded intent must be discarded, got $loaded")
    // and a landed intent (next-1 == applied batchId 0) is promoted
    DrainState.begin(spark, s"$root/out/_drain",
      DrainState.St(Map("x" -> 1L), next = 1L))
    val promoted = DrainState.load(spark, s"$root/out/_drain", out.lastAppliedBatchId)
    assert(promoted.versions == Map("x" -> 1L) && promoted.next == 1L,
      s"landed intent must be promoted, got $promoted")
  }
}
