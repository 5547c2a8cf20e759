package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.store.KeyedTable

import java.nio.file.Files

/** §6f-4: with `spark.graft.schema.autoMerge=true`, a source table that
  * gains a column BETWEEN drains flows through a drain-mode join stage
  * without a pipeline restart: the stage output table widens in place,
  * old rows null-fill, new rows carry the value. (The checkpointed
  * streaming path still requires a restart — its file source pins the
  * schema at query start; spec'd by the refusal-free drain path only.)
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("sev").toString

  test("source column added between drains evolves the join stage output") {
    spark.conf.set("spark.graft.schema.autoMerge", "true")
    try {
      val root = tmp()
      val o1 = Seq((1L, 10L, 100.0), (2L, 20L, 200.0)).toDF("oid", "cid", "amt")
      val c1 = Seq((10L, "alice"), (20L, "bob")).toDF("cid2", "name")
      val oT = KeyedTable.create(spark, s"$root/o", o1.schema, Seq("oid"), numBuckets = 4)
      val cT = KeyedTable.create(spark, s"$root/c", c1.schema, Seq("cid2"), numBuckets = 4)
      val pipe = Stream.fromKeyedTable(oT)
        .join(Stream.fromKeyedTable(cT), "inner")
        .on((l, r) => l("cid") === r("cid2"))
        .writeToPath(s"$root/out")

      oT.upsert(o1, uniqueKeys = true)
      cT.upsert(c1, uniqueKeys = true)
      pipe.runIncremental()
      val outT = KeyedTable.forPath(spark, s"$root/out")
      assert(!outT.snapshot().columns.contains("channel"))

      // the source evolves: new column + new rows carrying it
      val o2 = Seq((3L, 10L, 300.0, "web"), (1L, 10L, 150.0, "app"))
        .toDF("oid", "cid", "amt", "channel")
      oT.merge(o2, graft.store.MergeSpec(), uniqueKeys = true)
      assert(oT.dataCols.contains("channel"), "source table must evolve")
      pipe.runIncremental()

      val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
      assert(snap.columns.contains("channel"), "stage output must evolve")
      val byId = snap.collect().map(r => r.getLong(r.fieldIndex("oid")) ->
        Option(r.getAs[String]("channel"))).toMap
      assert(byId(3L).contains("web"))
      assert(byId(1L).contains("app"), "updated row must carry the new column")
      assert(byId(2L).isEmpty, "pre-evolution row null-fills")
    } finally spark.conf.unset("spark.graft.schema.autoMerge")
  }

  test("without autoMerge the new column is dropped, not an error") {
    val root = tmp()
    val o1 = Seq((1L, 10L, 100.0)).toDF("oid", "cid", "amt")
    val c1 = Seq((10L, "alice")).toDF("cid2", "name")
    val oT = KeyedTable.create(spark, s"$root/o", o1.schema, Seq("oid"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/c", c1.schema, Seq("cid2"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(oT)
      .join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("cid") === r("cid2"))
      .writeToPath(s"$root/out")
    oT.upsert(o1, uniqueKeys = true)
    cT.upsert(c1, uniqueKeys = true)
    pipe.runIncremental()
    oT.merge(Seq((2L, 10L, 200.0, "web")).toDF("oid", "cid", "amt", "channel"),
      graft.store.MergeSpec(), uniqueKeys = true)
    pipe.runIncremental()
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assert(!snap.columns.contains("channel"))
    assert(snap.count() == 2)
  }
}
