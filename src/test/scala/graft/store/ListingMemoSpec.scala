package graft.store

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

/** Listing-counting local FileSystem ("cfile" scheme): counts
  * listStatus calls that hit a table's `_log` directory so specs can
  * pin the commit-log listing memo's economics. */
class CountingLocalFs extends RawLocalFileSystem {
  override def getScheme: String = "cfile"
  override def getUri: java.net.URI = java.net.URI.create("cfile:///")
  override def listStatus(p: Path): Array[FileStatus] = {
    if (p.toString.contains("_log")) CountingLocalFs.logListings.incrementAndGet()
    super.listStatus(p)
  }
}
object CountingLocalFs {
  val logListings = new AtomicLong(0L)
}

/** The commit-log listing memo (SURVEY §6r-4): `versions()` serves a
  * cached listing validated by two O(1) existence probes — last+1 (OCC
  * claims are dense, so nothing newer can exist without it) and the
  * cached head (truncation deletes contiguously bottom-up) — and
  * `latestCheckpointAt` memoizes the checkpoint-name listing. Against
  * an object store at 10k+ commits the per-call `_log` listing is the
  * dominant read-path metadata latency; warm reads should do ZERO
  * listings, and external commits must still be picked up. */
class ListingMemoSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.cfile.impl", classOf[CountingLocalFs].getName)
    s
  }
  import spark.implicits._

  private def tmp(): String =
    "cfile:" + Files.createTempDirectory("glm").toString

  private def listings: Long = CountingLocalFs.logListings.get()

  test("warm reads list _log zero times; cold opens list once") {
    val t = tmp()
    val df = (1L to 500L).map(i => (i, i * 2.0)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"),
      numBuckets = 4)
    kt.upsert(df, uniqueKeys = true)
    kt.upsert(df.withColumn("v", col("v") + 1), uniqueKeys = true)
    kt.snapshot().count() // warm the memo
    kt.changesSince(1L).count()
    val before = listings
    kt.snapshot().count()
    kt.changesSince(1L).count()
    assert(kt.latestVersion == 2L)
    val warmCost = listings - before
    assert(warmCost == 0L,
      s"warm reads must probe, not list — saw $warmCost listings")
  }

  test("a local commit extends the memo without a re-list") {
    val t = tmp()
    val df = (1L to 200L).map(i => (i, s"x$i")).toDF("id", "s")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"),
      numBuckets = 2)
    kt.upsert(df, uniqueKeys = true)
    kt.snapshot().count() // warm
    val before = listings
    kt.upsert(df, uniqueKeys = true) // v2, extends memo in commit()
    kt.snapshot().count()
    assert(kt.latestVersion == 2L)
    assert(listings - before == 0L,
      "the winning writer knows its own version — no re-list needed")
  }

  test("an EXTERNAL writer's commit is picked up via the last+1 probe") {
    val t = tmp()
    val df = (1L to 200L).map(i => (i, i)).toDF("id", "n")
    val a = KeyedTable.create(spark, t, df.schema, keys = Seq("id"),
      numBuckets = 2)
    a.upsert(df, uniqueKeys = true)
    assert(a.snapshot().count() == 200L) // warm handle a's memo
    // second handle = another process
    val b = KeyedTable.forPath(spark, t)
    b.upsert((1L to 200L).map(i => (i, i * 10)).toDF("id", "n"),
      uniqueKeys = true)
    assert(a.latestVersion == 2L,
      "handle a's memo must detect the external commit")
    assert(a.snapshot().where(col("n") === col("id") * 10).count() == 200L)
    assert(a.changesSince(1L).count() > 0L)
  }

  test("external truncation is detected via the head probe (loud floor failure survives the memo)") {
    val t = tmp()
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "n")
    val a = KeyedTable.create(spark, t, df.schema, keys = Seq("id"),
      numBuckets = 2)
    (1 to 6).foreach(w => a.upsert(df.withColumn("n", col("n") + w),
      uniqueKeys = true))
    assert(a.changesSince(0L).count() > 0L) // warm a's memo at head=1
    val b = KeyedTable.forPath(spark, t)
    b.truncateLog(retainVersions = 2) // floor = 4, deletes v1..v4
    // a's cached listing still starts at 1; the head probe must force a
    // re-list so the gap guard re-reads the floor and fails LOUDLY
    // instead of serving a partial feed
    intercept[IllegalArgumentException] { a.changesSince(3L).count() }
    // v5 + v6 feeds: 100 update_preimage + 100 postimage rows each
    assert(a.changesSince(4L).count() == 400L)
  }
}
