package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.store.KeyedTable

import java.nio.file.Files

/** Reference-surface features beyond the core join/agg path:
  * partitionBy+prune (A11), stream union (A12), user foreachBatch
  * (ref joins.py:536), writer conf (A17).
  */
class StreamSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String = Files.createTempDirectory("gss").toString

  test("partitionBy(prune) join stage converges to batch result") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .withColumn("o_year", year(col("o_orderdate")))
      .drop("o_orderdate")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf)
    val q = Stream.fromKeyedTable(oT).join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .partitionBy(prune("o_year"))
      .writeToPath(s"$root/out").start()
    try {
      // two batches hitting disjoint year partitions, then an update
      oT.upsert(oDf.where(col("o_year") <= 1997)); q.processAllAvailable()
      oT.upsert(oDf.where(col("o_year") > 1997)); q.processAllAvailable()
      oT.upsert(oDf.where(col("o_orderkey") % 11 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 5.0))
      q.processAllAvailable()
      val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
      val want = oT.snapshot().join(cDf, col("o_custkey") === col("c_custkey"))
      val cols = want.columns.sorted.map(col).toIndexedSeq
      assert(got.select(cols: _*).exceptAll(want.select(cols: _*)).count() == 0)
      assert(want.select(cols: _*).exceptAll(got.select(cols: _*)).count() == 0)
      assert(KeyedTable.forPath(spark, s"$root/out").meta.prunedCols == Seq("o_year"))
    } finally q.stop()
  }

  test("stream union feeds both tables' changes into one join") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val half1 = oDf.where(col("o_orderkey") % 2 === 0)
    val half2 = oDf.where(col("o_orderkey") % 2 === 1)
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val t1 = KeyedTable.create(spark, s"$root/o1", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val t2 = KeyedTable.create(spark, s"$root/o2", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/c", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf)
    val unioned = Stream.fromKeyedTable(t1).union(Stream.fromKeyedTable(t2))
    val q = unioned.join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out").start()
    try {
      t1.upsert(half1); t2.upsert(half2); q.processAllAvailable()
      val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
      val want = oDf.join(cDf, col("o_custkey") === col("c_custkey"))
      assert(got.count() == want.count())
    } finally q.stop()
  }

  test("user foreachBatch sink receives combined join deltas") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf)
    @volatile var seen = 0L
    val q = Stream.fromKeyedTable(oT).join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .foreachBatch(s"$root/cp") { (df: DataFrame, _: Long) => seen += df.count() }
      .start()
    try {
      oT.upsert(oDf); q.processAllAvailable()
      assert(seen == oDf.count()) // every order matches exactly one customer
    } finally q.stop()
  }

  test("pipeline writer conf: queryName and trigger are applied") {
    val root = tmp()
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/c", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf); oT.upsert(oDf)
    val q = Stream.fromKeyedTable(oT).join(Stream.fromKeyedTable(cT), "left")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
      .queryName("my-gold-join")
      .option("spark.graft.marker", "1")
      .start()
    try {
      assert(q.queries.last._2.name == "my-gold-join")
      q.processAllAvailable()
      assert(KeyedTable.forPath(spark, s"$root/out").snapshot().count() == oDf.count())
    } finally q.stop()
  }

  test("agg stage partitionBy(prune) converges and records pruned cols") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val q = Stream.fromKeyedTable(oT)
      .groupBy("o_orderstatus")
      .agg(sum("o_totalprice").as("total"), count(lit(1)).as("cnt"))
      .partitionBy(prune("o_orderstatus"))
      .writeToPath(s"$root/agg").start()
    try {
      oT.upsert(oDf.where(col("o_orderkey") % 2 === 0)); q.processAllAvailable()
      oT.upsert(oDf.where(col("o_orderkey") % 2 === 1)); q.processAllAvailable()
      val outT = KeyedTable.forPath(spark, s"$root/agg")
      assert(outT.meta.prunedCols == Seq("o_orderstatus"))
      val got = outT.snapshot().select(col("o_orderstatus"),
        round(col("total"), 2).as("total"), col("cnt"))
      val want = oT.snapshot().groupBy("o_orderstatus")
        .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("cnt"))
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("selectStar with aliased ColumnSel transform (ref select('*', col.alias))") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    val o = Stream.fromKeyedTable(oT)
    val c = Stream.fromKeyedTable(cT)
    val q = o.join(c, "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .selectStar(o("o_totalprice").to(x => round(x * 2, 2)).alias("double_price"))
      .writeToPath(s"$root/out")
      .start()
    try {
      oT.upsert(oDf, uniqueKeys = true)
      cT.upsert(cDf, uniqueKeys = true)
      q.processAllAvailable()
    } finally q.stop()
    val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
    val want = oDf.join(cDf, col("o_custkey") === col("c_custkey"))
      .withColumn("double_price", round(col("o_totalprice") * 2, 2))
    assert(got.columns.contains("double_price"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("delete then re-insert within one microbatch resolves by commit order") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf, uniqueKeys = true)
    val q = Stream.fromKeyedTable(oT).handleDeletes()
      .join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
      .start()
    try {
      oT.upsert(oDf, uniqueKeys = true)                                  // commit 1
      oT.delete(oDf.where(col("o_orderkey") % 2 === 0).select("o_orderkey")) // commit 2
      oT.upsert(oDf.where(col("o_orderkey") % 4 === 0), uniqueKeys = true)   // commit 3
      q.processAllAvailable()
    } finally q.stop()
    val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
    val want = oDf.where(col("o_orderkey") % 2 =!= 0 || col("o_orderkey") % 4 === 0)
      .join(cDf, col("o_custkey") === col("c_custkey"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      s"got ${got.count()} want ${want.count()}")
  }
}
