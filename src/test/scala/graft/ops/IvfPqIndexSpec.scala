package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.store.KeyedTable

import java.nio.file.Files

/** The incrementally-maintained IVF+PQ index (SURVEY §2 B34b): frozen
  * codebooks make incremental maintenance EXACTLY equivalent to a
  * direct encode of the final corpus, deletes retract, and replayed
  * batchIds are exactly-once.
  */
class IvfPqIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def tmp(): String = Files.createTempDirectory("ivfpq").toString

  test("seed build + upserts + re-embeds equal a direct frozen-book encode") {
    val root = tmp()
    val corpus = Tables.embeddings(spark, sf)
    IvfPqIndex.build(spark, s"$root/idx", corpus.where(col("vec_id") < 250),
      nlist = 8, m = 8, k = 8)
    IvfPqIndex.upsert(spark, s"$root/idx", corpus.where(col("vec_id") >= 250))
    val re = corpus.where(col("vec_id") < 10)
      .withColumn("embedding",
        transform(col("embedding"), x => (x * lit(0.5d)).cast("float")))
    IvfPqIndex.upsert(spark, s"$root/idx", re)
    // the incrementally-maintained state must equal encoding the FINAL
    // corpus against the same frozen books in one pass
    val finalCorpus = corpus.where(col("vec_id") >= 10).unionByName(re)
    val root2 = tmp()
    IvfPqIndex.build(spark, s"$root2/idx", corpus.where(col("vec_id") < 250),
      nlist = 8, m = 8, k = 8)
    // wipe and re-encode everything through the upsert path of a fresh
    // index that shares the training corpus (same deterministic books)
    IvfPqIndex.upsert(spark, s"$root2/idx", finalCorpus)
    def state(p: String) = KeyedTable.forPath(spark, p).snapshot()
      .select(col("vec_id"), col("list"), concat_ws(",", col("codes")).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(state(s"$root/idx") == state(s"$root2/idx"))
  }

  test("delete retracts; queries see only the surviving index") {
    val root = tmp()
    val corpus = Tables.embeddings(spark, sf)
    IvfPqIndex.build(spark, s"$root/idx", corpus, nlist = 8, m = 8, k = 8)
    val q = corpus.orderBy("vec_id").select("embedding").head.getSeq[Any](0)
      .map { case f: Float => f.toDouble; case n: Number => n.doubleValue() }.toSeq
    val before = IvfPqIndex.query(spark, s"$root/idx", q, k = 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    IvfPqIndex.delete(spark, s"$root/idx",
      corpus.where(col("vec_id").isin(before.take(3).toSeq.map(Long.box): _*))
        .select("vec_id"))
    val after = IvfPqIndex.query(spark, s"$root/idx", q, k = 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(before.take(3).forall(id => !after.contains(id)),
      s"deleted ids still returned: ${before.take(3).intersect(after)}")
  }

  test("replayed batchId is exactly-once") {
    val root = tmp()
    val corpus = Tables.embeddings(spark, sf)
    IvfPqIndex.build(spark, s"$root/idx", corpus.where(col("vec_id") < 100),
      nlist = 8, m = 8, k = 8)
    val add = corpus.where(col("vec_id").between(100, 149))
    val v1 = IvfPqIndex.upsert(spark, s"$root/idx", add, batchId = 7L)
    val v2 = IvfPqIndex.upsert(spark, s"$root/idx", add, batchId = 7L) // replay
    assert(v1 == v2, "replayed batch landed a second version")
    assert(KeyedTable.forPath(spark, s"$root/idx").snapshot().count() == 150)
  }
}
