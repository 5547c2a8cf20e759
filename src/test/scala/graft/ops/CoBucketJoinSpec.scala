package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.ShuffleDependency
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.store.KeyedTable

import java.nio.file.Files

class CoBucketJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def mkTables(): (KeyedTable, KeyedTable) = {
    val root = Files.createTempDirectory("cb").toString
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val rollup = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey").alias("o_orderkey"))
      .agg(count(lit(1)).alias("line_cnt"))
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val rT = KeyedTable.create(spark, s"$root/r", rollup.schema, Seq("o_orderkey"), numBuckets = 8)
    oT.upsert(oDf, uniqueKeys = true)
    rT.upsert(rollup, uniqueKeys = true)
    (oT, rT)
  }

  test("co-bucket inner and left join equal the DataFrame join") {
    val (oT, rT) = mkTables()
    for (jt <- Seq("inner", "left")) {
      val got = CoBucketJoin.join(oT, rT, Seq("o_orderkey"), joinType = jt)
      val want = oT.snapshot().join(rT.snapshot(), Seq("o_orderkey"), jt)
      val cols = want.columns.sorted.map(col).toSeq
      assert(got.select(cols: _*).exceptAll(want.select(cols: _*)).count() == 0 &&
        want.select(cols: _*).exceptAll(got.select(cols: _*)).count() == 0,
        s"$jt join mismatch")
      // some orders genuinely have no lineitems → left adds rows
      if (jt == "left") assert(got.count() > CoBucketJoin
        .join(oT, rT, Seq("o_orderkey")).count())
    }
  }

  test("the joined lineage contains NO shuffle dependency") {
    val (oT, rT) = mkTables()
    val joined = CoBucketJoin.join(oT, rT, Seq("o_orderkey"))
    def shuffles(rdd: RDD[_], seen: Set[Int]): Boolean =
      !seen.contains(rdd.id) && (
        rdd.dependencies.exists(_.isInstanceOf[ShuffleDependency[_, _, _]]) ||
        rdd.dependencies.exists(d => shuffles(d.rdd, seen + rdd.id)))
    assert(joined.rdd.getNumPartitions == 8)
    assert(!shuffles(joined.rdd, Set.empty), "expected zero shuffles")
  }

  test("build=left inner join matches, and misaligned tables are refused") {
    val (oT, rT) = mkTables()
    val a = CoBucketJoin.join(oT, rT, Seq("o_orderkey"))
    val b = CoBucketJoin.join(oT, rT, Seq("o_orderkey"), build = "left")
    val cols = a.columns.sorted.map(col).toSeq
    assert(a.select(cols: _*).exceptAll(b.select(cols: _*)).count() == 0 &&
      b.select(cols: _*).exceptAll(a.select(cols: _*)).count() == 0)
    val root = Files.createTempDirectory("cb2").toString
    val other = KeyedTable.create(spark, s"$root/x",
      rT.snapshot().schema, Seq("o_orderkey"), numBuckets = 16)
    intercept[IllegalArgumentException] {
      CoBucketJoin.join(oT, other, Seq("o_orderkey"))
    }
  }
}
