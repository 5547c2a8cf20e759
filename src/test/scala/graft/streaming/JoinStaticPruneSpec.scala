package graft.streaming

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.store.KeyedTable

import java.nio.file.Files

/** Bucket-pruned static sides in incremental join merges: each join
  * half probes a small batch against the other side's static snapshot.
  * Reading the WHOLE static per microbatch is the delta-join's 100 TB
  * bottleneck — when the equality keys cover the static table's bucket
  * keys, the half reads only the buckets/files the batch's key hashes
  * can live in ([[graft.store.KeyedTable.snapshotForKeys]]),
  * version-pinned like the full scan it replaces.
  */
class JoinStaticPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String = Files.createTempDirectory("gsp").toString

  private def assertSameRows(got: DataFrame, want: DataFrame, ctx: String): Unit = {
    val cols = want.columns.sorted.toSeq
    val g = got.select(cols.map(col): _*)
    val w = want.select(cols.map(col): _*)
    assert(g.exceptAll(w).count() == 0 && w.exceptAll(g).count() == 0, ctx)
  }

  private def withPruneForced[T](f: => T): T = {
    spark.conf.set("spark.graft.join.staticPrune.minBytes", "0")
    try f finally spark.conf.unset("spark.graft.join.staticPrune.minBytes")
  }

  test("snapshotForKeys pins at the requested version") {
    val root = tmp()
    val df = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").limit(100)
    val t = KeyedTable.create(spark, s"$root/t", df.schema, Seq("o_orderkey"),
      numBuckets = 4)
    t.upsert(df, uniqueKeys = true) // v1
    t.upsert(df.withColumn("o_totalprice", lit(9.99)), uniqueKeys = true) // v2
    val keys = df.select("o_orderkey").limit(5)
    val atV1 = t.snapshotForKeys(keys, 1L).agg(sum("o_totalprice")).collect().head
    val atV2 = t.snapshotForKeys(keys, 2L).select("o_totalprice").distinct().collect()
    assert(atV2.map(_.getDouble(0)).toSeq == Seq(9.99), "v2 read shows v2 rows")
    assert(atV1.getDouble(0) != 5 * 9.99, "v1 read must not see v2 rows")
  }

  test("pruned inner and left join halves match the batch fixpoint") {
    withPruneForced {
      for (jt <- Seq("inner", "left")) {
        val root = tmp()
        val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
        val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
        val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema,
          Seq("o_orderkey"), numBuckets = 8)
        val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema,
          Seq("c_custkey"), numBuckets = 8)
        val pipe = Stream.fromKeyedTable(oT)
          .join(Stream.fromKeyedTable(cT), jt)
          .on((l, r) => l("o_custkey") === r("c_custkey"))
          .writeToPath(s"$root/out")

        val pruneJobs = new java.util.concurrent.atomic.AtomicInteger
        val listener = new SparkListener {
          override def onJobStart(js: SparkListenerJobStart): Unit =
            if (js.properties.getProperty("spark.job.description") == "graft:join:prune")
              pruneJobs.incrementAndGet()
        }
        // wave 1 seeds both sides; wave 2 updates a small order slice so
        // the left batch probes the (now nonempty) customer static
        cT.upsert(cDf.where(col("c_custkey") % 3 =!= 0), uniqueKeys = true)
        oT.upsert(oDf, uniqueKeys = true)
        pipe.runIncremental()
        spark.sparkContext.addSparkListener(listener)
        try {
          oT.upsert(oDf.where(col("o_orderkey") % 7 === 0)
            .withColumn("o_totalprice", col("o_totalprice") + 1), uniqueKeys = true)
          cT.upsert(cDf.where(col("c_custkey") % 3 === 0), uniqueKeys = true)
          pipe.runIncremental()
          Thread.sleep(500) // async listener bus
        } finally spark.sparkContext.removeSparkListener(listener)
        assert(pruneJobs.get() > 0, s"$jt: static prune path never engaged")

        val out = KeyedTable.forPath(spark, s"$root/out")
        val want = oT.snapshot()
          .join(cT.snapshot(), col("o_custkey") === col("c_custkey"), jt)
        assertSameRows(out.snapshot().select(want.columns.map(col): _*), want,
          s"$jt: pruned drain != batch join")
      }
    }
  }

  test("non-bucket-key equality falls back to the full static and stays correct") {
    withPruneForced {
      val root = tmp()
      // join on c_name — NOT customer's bucket key — so coverage fails
      // and the half must scan the full static
      val oDf = Tables.orders(spark, sf)
        .select(col("o_orderkey"), concat(lit("Customer#"),
          lpad(col("o_custkey").cast("string"), 9, "0")).alias("o_cname"))
      val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
      val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema,
        Seq("o_orderkey"), numBuckets = 4)
      val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema,
        Seq("c_custkey"), numBuckets = 4)
      val pipe = Stream.fromKeyedTable(oT)
        .join(Stream.fromKeyedTable(cT), "inner")
        .on((l, r) => l("o_cname") === r("c_name"))
        .writeToPath(s"$root/out")
      cT.upsert(cDf, uniqueKeys = true)
      oT.upsert(oDf, uniqueKeys = true)
      pipe.runIncremental()
      oT.upsert(oDf.limit(50), uniqueKeys = true)
      pipe.runIncremental()
      val out = KeyedTable.forPath(spark, s"$root/out")
      val want = oT.snapshot()
        .join(cT.snapshot(), col("o_cname") === col("c_name"), "inner")
      assertSameRows(out.snapshot().select(want.columns.map(col): _*), want,
        "fallback drain != batch join")
    }
  }
}
