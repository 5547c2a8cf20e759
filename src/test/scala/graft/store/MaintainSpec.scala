package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import java.nio.file.Files

/** One-call maintenance driver (r14 verdict #2): `maintain(policy)`
  * must READ the owed-maintenance state (`describeHealth`, live bytes)
  * and act on it — health-triggered compaction, over-bound clustering,
  * growth rebucket, retention — in dependency order, idempotently, and
  * without ever changing table contents. */
class MaintainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("maint").toString

  private def fileCount(kt: KeyedTable): Int =
    kt.describeHealth().agg(sum("files")).head.getLong(0).toInt

  test("health-triggered compact + growth rebucket in ONE call; idempotent re-run") {
    val t = tmp()
    val df = (1L to 3000L).map(i => (i, s"payload_$i" * 8)).toDF("id", "s")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 2)
    // a tiny file-row target splits every bucket rewrite into many
    // small files — the tail state scheduled maintenance owns
    spark.conf.set("spark.graft.targetFileRows", "200")
    try (0 until 6).foreach(i =>
      kt.upsert(df.where(col("id") % 6 === i), uniqueKeys = true))
    finally spark.conf.unset("spark.graft.targetFileRows")
    val before = kt.snapshot().orderBy("id").collect()
    val cdfBefore = kt.changesSince(0L).count()
    val filesBefore = fileCount(kt)
    assert(filesBefore > 2, "setup must leave a multi-file layout")

    // a tiny per-bucket target forces growth; compaction is owed too
    val r = kt.maintain(MaintenancePolicy(
      targetBucketBytes = 8 * 1024, maxBuckets = 16))
    assert(r.rebucketedTo.exists(n => n > 2 && Integer.bitCount(n) == 1),
      s"growth must run and land on a power of two, got ${r.rebucketedTo}")
    assert(kt.meta.numBuckets == r.rebucketedTo.get)
    // the rebucket subsumed the small-file tail: one pass, healthy layout
    assert(fileCount(kt) <= kt.meta.numBuckets,
      "post-maintain layout must be packed")
    assert(!r.vacuumed && !r.truncated, "retention passes are opt-in")
    // contents and change feed untouched — maintenance is layout-only
    assert(kt.snapshot().orderBy("id").collect().toSeq == before.toSeq)
    assert(kt.changesSince(0L).count() == cdfBefore)

    // idempotent: a healthy table owes nothing
    val v = kt.latestVersion
    val r2 = kt.maintain(MaintenancePolicy(
      targetBucketBytes = 8 * 1024, maxBuckets = 16))
    assert(r2 == MaintenanceReport(None, 0, compacted = false,
      vacuumed = false, truncated = false), s"re-run must no-op, got $r2")
    assert(kt.latestVersion == v, "re-run must not commit")
  }

  test("over-bound buckets trigger the clustering pass; healthy ones skip it") {
    val t = tmp()
    val df = (1L to 2000L).map(i => (i, (i % 97).toDouble)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 2)
    spark.conf.set("spark.graft.targetFileRows", "200")
    try (0 until 4).foreach(i =>
      kt.upsert(df.where(col("id") % 4 === i), uniqueKeys = true))
    finally spark.conf.unset("spark.graft.targetFileRows")
    val before = kt.snapshot().orderBy("id").collect()
    // every file "graduated" + a 1-file bound → over_bound everywhere
    spark.conf.set("spark.graft.autoCompact.foldMaxFileBytes", "1")
    spark.conf.set("spark.graft.autoCompact.maxFiles", "1")
    val r = try kt.maintain(MaintenancePolicy(clusterCols = Seq("v"),
        bucketsPerStep = 1))
      finally {
        spark.conf.unset("spark.graft.autoCompact.foldMaxFileBytes")
        spark.conf.unset("spark.graft.autoCompact.maxFiles")
      }
    assert(r.clustered > 0, "over-bound layout must trigger clustering")
    assert(r.rebucketedTo.isEmpty, "no growth owed at this size")
    assert(kt.snapshot().orderBy("id").collect().toSeq == before.toSeq)
    // healthy now: the same policy skips the pass entirely
    val r2 = kt.maintain(MaintenancePolicy(clusterCols = Seq("v")))
    assert(r2.clustered == 0, "healthy layout must skip clustering")
  }

  test("opt-in retention runs vacuum then truncateLog in contract order") {
    val t = tmp()
    val df = (1L to 500L).map(i => (i, i.toDouble)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 2)
    (0 until 5).foreach(i =>
      kt.upsert(df.where(col("id") % 5 === i), uniqueKeys = true))
    val log = new CommitLog(t, spark.sessionState.newHadoopConf())
    assert(log.versions().size == 5)
    spark.conf.set("spark.graft.pendingGraceMs", "-1")
    val r = try kt.maintain(MaintenancePolicy(
        vacuumRetainVersions = Some(1), truncateRetainVersions = Some(2)))
      finally spark.conf.unset("spark.graft.pendingGraceMs")
    assert(r.vacuumed && r.truncated)
    assert(log.versions().size <= 2, "old commit files must be truncated")
    assert(kt.snapshot().count() == 500, "retained reads survive retention")
  }
}
