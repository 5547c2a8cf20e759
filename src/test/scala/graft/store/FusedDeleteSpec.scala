package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

import java.nio.file.Files

/** `merge(deleteKeys = ...)` — deletions and the staged batch land in
  * ONE commit with delete-then-merge semantics: deletions apply to the
  * pre-batch state, then staged rows merge (a staged row sharing a
  * deleted key re-inserts). The retract-and-replace passes (outer-join
  * downgrades) depend on the atomicity; file pruning must account for
  * delete-key hashes or a carried file would resurrect a deleted row.
  */
class FusedDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("gfd").toString

  test("delete + upsert land as one commit; cdf carries both classes") {
    val df = (1L to 20L).map(i => (i, i * 10)).toDF("k", "v")
    val t = KeyedTable.create(spark, tmp(), df.schema, Seq("k"), numBuckets = 4)
    t.upsert(df, uniqueKeys = true)
    val v1 = t.latestVersion
    t.merge((21L to 23L).map(i => (i, i * 10)).toDF("k", "v"),
      MergeSpec(), uniqueKeys = true,
      deleteKeys = Some(Seq(1L, 2L).toDF("k")))
    assert(t.latestVersion == v1 + 1, "one fused commit, not two")
    val snap = t.snapshot()
    assert(snap.where(col("k").isin(1L, 2L)).count() == 0)
    assert(snap.where(col("k").isin(21L, 22L, 23L)).count() == 3)
    assert(snap.count() == 21)
    val cdf = t.changesSince(v1)
    assert(cdf.where(col("_change_type") === "delete").count() == 2)
    assert(cdf.where(col("_change_type") === "insert").count() == 3)
    assert(cdf.select("_commit_version").distinct().count() == 1,
      "all change rows share the fused commit's version")
  }

  test("a staged row sharing a deleted key re-inserts (delete-then-merge)") {
    val df = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val t = KeyedTable.create(spark, tmp(), df.schema, Seq("k"), numBuckets = 4)
    t.upsert(df, uniqueKeys = true)
    val v1 = t.latestVersion
    t.merge(Seq((1L, 999L)).toDF("k", "v"), MergeSpec(), uniqueKeys = true,
      deleteKeys = Some(Seq(1L).toDF("k")))
    val snap = t.snapshot()
    assert(snap.where(col("k") === 1L).select("v").head().getLong(0) == 999L)
    val cdf = t.changesSince(v1)
    assert(cdf.where(col("_change_type") === "delete" && col("k") === 1L).count() == 1)
    assert(cdf.where(col("_change_type") === "insert" && col("k") === 1L).count() == 1,
      "re-insert, not update: the deletion applied first")
  }

  test("delete-only fused merge (empty staged batch) still commits") {
    val df = (1L to 10L).map(i => (i, i)).toDF("k", "v")
    val t = KeyedTable.create(spark, tmp(), df.schema, Seq("k"), numBuckets = 4)
    t.upsert(df, uniqueKeys = true)
    val v1 = t.latestVersion
    t.merge(df.limit(0), MergeSpec(), uniqueKeys = true,
      deleteKeys = Some(Seq(3L, 7L).toDF("k")))
    assert(t.latestVersion == v1 + 1)
    assert(t.snapshot().count() == 8)
    assert(t.changesSince(v1).where(col("_change_type") === "delete").count() == 2)
  }

  test("file pruning includes delete-key hashes: no carried file resurrects a row") {
    // tiny files → many per bucket; stage a batch whose OWN hash range
    // is far from the deleted keys', so pruning on staged hashes alone
    // would carry (and thereby keep) the deleted keys' files
    spark.conf.set("spark.graft.targetFileRows", "10")
    try {
      val df = (1L to 400L).map(i => (i, i)).toDF("k", "v")
      val t = KeyedTable.create(spark, tmp(), df.schema, Seq("k"), numBuckets = 2)
      t.upsert(df, uniqueKeys = true)
      val dels = (1L to 400L by 40L).toSeq
      t.merge(Seq((500L, 500L)).toDF("k", "v"), MergeSpec(), uniqueKeys = true,
        deleteKeys = Some(dels.toDF("k")))
      val snap = t.snapshot()
      assert(snap.where(col("k").isin(dels: _*)).count() == 0,
        "every deleted key must be gone even when its file was prunable")
      assert(snap.count() == 400 - dels.size + 1)
    } finally spark.conf.unset("spark.graft.targetFileRows")
  }

  test("fused merge replays as a batchId no-op") {
    val df = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val t = KeyedTable.create(spark, tmp(), df.schema, Seq("k"), numBuckets = 4)
    t.upsert(df, uniqueKeys = true, batchId = 0L)
    t.merge(Seq((3L, 30L)).toDF("k", "v"), MergeSpec(), uniqueKeys = true,
      batchId = 1L, deleteKeys = Some(Seq(1L).toDF("k")))
    val v = t.latestVersion
    t.merge(Seq((3L, 30L)).toDF("k", "v"), MergeSpec(), uniqueKeys = true,
      batchId = 1L, deleteKeys = Some(Seq(2L).toDF("k")))
    assert(t.latestVersion == v, "replayed batchId skips deletions too")
    assert(t.snapshot().where(col("k") === 2L).count() == 1)
  }
}
