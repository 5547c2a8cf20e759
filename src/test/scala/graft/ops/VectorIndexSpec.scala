package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("incremental build+upsert index equals brute force at nprobe=nlist") {
    val path = java.nio.file.Files.createTempDirectory("vidx").toString + "/idx"
    val e = graft.Tables.embeddings(spark, sf)
    VectorIndex.build(spark, path, e.where(col("vec_id") % 2 === 0), nlist = 4)
    VectorIndex.upsert(spark, path, e.where(col("vec_id") % 2 === 1), batchId = 1L)
    val queries = e.where(col("vec_id") < 5)
    val got = VectorIndex.query(spark, path, queries, k = 3, nprobe = 4)
      .select("query_id", "neighbor_id", "rank")
    val want = Similarity.bruteForceTopK(e, queries, k = 3)
      .select("query_id", "neighbor_id", "rank")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("an updated vector moves lists atomically and replayed batches are no-ops") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("vidx").toString + "/idx"
    val e = graft.Tables.embeddings(spark, sf)
    VectorIndex.build(spark, path, e, nlist = 4)
    val kt = graft.store.KeyedTable.forPath(spark, path)
    val before = kt.snapshot().where(col("vec_id") === 7)
      .select("cluster").head.getInt(0)
    // replace vector 7 with (a perturbation of) vector 100's embedding:
    // its cluster must become vector 100's
    val target = kt.snapshot().where(col("vec_id") === 100)
      .select("cluster").head.getInt(0)
    val moved = e.where(col("vec_id") === 100)
      .select(lit(7L).alias("vec_id"), col("embedding"))
    VectorIndex.upsert(spark, path, moved, batchId = 5L)
    val after = kt.snapshot().where(col("vec_id") === 7)
      .select("cluster").head.getInt(0)
    assert(after == target, s"cluster $before -> $after, want $target")
    assert(kt.snapshot().where(col("vec_id") === 7).count() == 1)
    // exactly-once: replaying the same batchId changes nothing
    val v = kt.latestVersion
    VectorIndex.upsert(spark, path,
      e.where(col("vec_id") === 7), batchId = 5L)
    assert(graft.store.KeyedTable.forPath(spark, path).latestVersion == v)
  }

  test("query scan carries the probed-cluster pushdown") {
    val path = java.nio.file.Files.createTempDirectory("vidx").toString + "/idx"
    val e = graft.Tables.embeddings(spark, sf)
    VectorIndex.build(spark, path, e, nlist = 4)
    val plan = VectorIndex.query(spark, path, e.where(col("vec_id") < 3),
      k = 3, nprobe = 1).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("cluster"),
      s"probed-cluster predicate not pushed:\n$plan")
  }
}
