package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.store.KeyedTable

import java.nio.file.Files

/** Incremental pipelines must converge to the batch fixpoint — the
  * reference's own test method (tests/JoinTest*.py compare the streamed
  * result table against a one-shot DataFrame join).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String = Files.createTempDirectory("gs").toString

  /** Splits a DF into n disjoint slices by key hash for multi-batch feeds. */
  private def slices(df: DataFrame, key: String, n: Int): Seq[DataFrame] =
    (0 until n).map(i => df.where(pmod(xxhash64(col(key)), lit(n)) === i))

  private def assertSameRows(got: DataFrame, want: DataFrame, ctx: String): Unit = {
    val cols = want.columns.sorted.toSeq
    val g = got.select(cols.map(col): _*)
    val w = want.select(cols.map(col): _*)
    val onlyGot = g.exceptAll(w).count()
    val onlyWant = w.exceptAll(g).count()
    assert(onlyGot == 0 && onlyWant == 0,
      s"$ctx: $onlyGot rows only in streamed result, $onlyWant only in batch result")
  }

  test("incremental inner join equals batch join across multi-batch feed and updates") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name", "c_acctbal")

    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 8)

    // seed half the customers before starting
    val cParts = slices(cDf, "c_custkey", 2)
    cT.upsert(cParts(0))

    val o = Stream.fromKeyedTable(oT, maxFilesPerTrigger = 4)
    val c = Stream.fromKeyedTable(cT, maxFilesPerTrigger = 4)
    val pipe = o.join(c, "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
    val q = pipe.start()
    try {
      // feed orders in 3 slices, customers' second half mid-way
      val oParts = slices(oDf, "o_orderkey", 3)
      oT.upsert(oParts(0)); q.processAllAvailable()
      oT.upsert(oParts(1)); cT.upsert(cParts(1)); q.processAllAvailable()
      oT.upsert(oParts(2))
      // update a customer: joined rows must reflect the new name
      cT.upsert(cDf.where(col("c_custkey") % 7 === 0).withColumn("c_name", lit("UPDATED")))
      q.processAllAvailable()

      val out = KeyedTable.forPath(spark, s"$root/out").snapshot()
      val cNow = cT.snapshot()
      val want = oT.snapshot().join(cNow, col("o_custkey") === col("c_custkey"), "inner")
      assertSameRows(out, want, "inner join")

      // progress passthroughs (streams.py:253-268 parity): one entry per
      // stage, and the stage that just processed batches reports them
      val last = q.lastProgress
      val recent = q.recentProgress
      assert(last.keySet == q.queries.map(_._1).toSet && last.keySet.nonEmpty)
      assert(recent.keySet == last.keySet)
      assert(recent.values.exists(_.nonEmpty),
        "no stage recorded any StreamingQueryProgress after processing")
      assert(last.values.exists(p => p != null && p.numInputRows >= 0))
    } finally q.stop()
  }

  test("incremental left join upgrades unmatched placeholders when match arrives") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")

    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 8)

    val o = Stream.fromKeyedTable(oT, maxFilesPerTrigger = 8)
    val c = Stream.fromKeyedTable(cT, maxFilesPerTrigger = 8)
    val q = o.join(c, "left")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out").start()
    try {
      // all orders first: every row is an unmatched (null customer) placeholder
      oT.upsert(oDf); q.processAllAvailable()
      val outT = KeyedTable.forPath(spark, s"$root/out")
      assert(outT.snapshot().where(col("c_custkey").isNull).count() == oDf.count())
      // customers arrive: placeholders must upgrade in place, no duplicates
      cT.upsert(cDf); q.processAllAvailable()
      val want = oDf.join(cDf, col("o_custkey") === col("c_custkey"), "left")
      assertSameRows(outT.snapshot(), want, "left join after upgrade")
    } finally q.stop()
  }

  test("incremental groupBy agg equals batch aggregate under updates") {
    val root = tmp()
    val lDf = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val lT = KeyedTable.create(spark, s"$root/lineitem", lDf.schema,
      Seq("l_orderkey", "l_linenumber"), numBuckets = 8)

    val l = Stream.fromKeyedTable(lT, maxFilesPerTrigger = 8)
    val q = l.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("total_qty"), count(lit(1)).as("cnt"))
      .writeToPath(s"$root/agg").start()
    try {
      val parts = slices(lDf, "l_orderkey", 3)
      parts.foreach { p => lT.upsert(p); q.processAllAvailable() }
      // update: quantities doubled for some rows → pre/post images must cancel
      lT.upsert(lDf.where(col("l_orderkey") % 5 === 0)
        .withColumn("l_quantity", col("l_quantity") * 2))
      q.processAllAvailable()

      val got = KeyedTable.forPath(spark, s"$root/agg").snapshot()
        .select(col("l_returnflag"), round(col("total_qty"), 2).as("total_qty"), col("cnt"))
      val want = lT.snapshot().groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("total_qty"), count(lit(1)).as("cnt"))
      assertSameRows(got, want, "incremental agg")
    } finally q.stop()
  }

  test("chained join then agg equals batch equivalent") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")

    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf)

    val o = Stream.fromKeyedTable(oT, maxFilesPerTrigger = 8)
    val c = Stream.fromKeyedTable(cT, maxFilesPerTrigger = 8)
    val q = o.join(c, "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .groupByStaged(s"$root/stage1", "c_mktsegment")
      .agg(sum("o_totalprice").as("seg_total"), count(lit(1)).as("cnt"))
      .writeToPath(s"$root/agg").start()
    try {
      slices(oDf, "o_orderkey", 2).foreach { p => oT.upsert(p); q.processAllAvailable() }
      val got = KeyedTable.forPath(spark, s"$root/agg").snapshot()
        .select(col("c_mktsegment"), round(col("seg_total"), 2).as("seg_total"), col("cnt"))
      val want = oT.snapshot().join(cDf, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum("o_totalprice"), 2).as("seg_total"), count(lit(1)).as("cnt"))
      assertSameRows(got, want, "join→agg chain")
    } finally q.stop()
  }
}
