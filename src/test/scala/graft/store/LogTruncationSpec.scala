package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

import java.nio.file.Files

/** Commit-log truncation (Delta logRetention analog, SURVEY §6l-2):
  * `truncateLog` checkpoints the full live file manifest at the oldest
  * retained version, records the floor, and deletes older commit
  * files. Reads at retained versions must be unaffected — including
  * buckets whose OWNING commit was truncated (their file lists come
  * from the checkpoint manifest) — while reads at or below the floor
  * fail loudly instead of coming back partial.
  */
class LogTruncationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String = Files.createTempDirectory("gtr").toString

  private def mkTable(root: String): (KeyedTable, org.apache.spark.sql.DataFrame) = {
    val df = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").limit(200)
    val t = KeyedTable.create(spark, s"$root/t", df.schema, Seq("o_orderkey"),
      numBuckets = 8)
    t.upsert(df, uniqueKeys = true) // v1: every bucket owned by v1
    // v2..v6: single-key upserts — only ONE bucket's owning version
    // advances; the rest stay owned by (soon-truncated) v1
    (2 to 6).foreach { i =>
      t.upsert(df.limit(1).withColumn("o_totalprice", lit(i.toDouble)),
        uniqueKeys = true)
    }
    (t, df)
  }

  test("truncation preserves snapshots, point reads, merges, and cold opens") {
    val root = tmp()
    val (t, df) = mkTable(root)
    val before = t.snapshot().orderBy("o_orderkey").collect()
    t.truncateLog(retainVersions = 2) // keep v5, v6; floor = 4
    val log = new CommitLog(s"$root/t", spark.sessionState.newHadoopConf())
    assert(log.versions() == Seq(5L, 6L), s"got ${log.versions()}")
    assert(log.truncationFloor == 4L)
    // same-handle snapshot: buckets owned by truncated v1 read through
    // the checkpoint manifest
    assert(t.snapshot().orderBy("o_orderkey").collect().sameElements(before))
    // bucket-pruned point read
    val hit = t.snapshotForKeys(df.limit(1).select("o_orderkey")).collect()
    assert(hit.length == 1 && hit.head.getDouble(2) == 6.0)
    // cold open (fresh process): replay starts from the checkpoint
    val t2 = KeyedTable.forPath(spark, s"$root/t")
    assert(t2.snapshot().count() == 200)
    // a NEW merge replays the bucket map + carried files correctly
    t2.upsert(df.limit(50).withColumn("o_totalprice", lit(99.0)),
      uniqueKeys = true)
    assert(t2.snapshot().where(col("o_totalprice") === 99.0).count() == 50)
    assert(t2.snapshot().count() == 200)
  }

  test("reads at or below the floor fail loudly; above it they work") {
    val root = tmp()
    val (t, _) = mkTable(root)
    t.truncateLog(retainVersions = 2) // floor = 4
    intercept[IllegalArgumentException] { t.snapshot(4L).count() }
    intercept[IllegalArgumentException] { t.changesSince(3L).count() }
    assert(t.snapshot(5L).count() == 200) // retained version still serves
    assert(t.changesSince(4L).count() == 4L) // v5, v6 feeds (pre+post each)
  }

  test("vacuum after truncation keeps carried-forward files readable") {
    val root = tmp()
    val (t, _) = mkTable(root)
    t.truncateLog(retainVersions = 2)
    t.vacuum(retainVersions = 2)
    assert(t.snapshot().count() == 200)
    val t2 = KeyedTable.forPath(spark, s"$root/t")
    assert(t2.snapshot().count() == 200)
  }

  test("a stale handle detects cross-process truncation and fails loudly") {
    val root = tmp()
    val (t, df) = mkTable(root)
    // handle `a` opens first and caches floor = -1
    val a = KeyedTable.forPath(spark, s"$root/t")
    assert(a.changesSince(0L).count() > 0)
    // another handle (emulating another process: its own CommitLog and
    // floor cache) truncates underneath it
    t.truncateLog(retainVersions = 2) // floor = 4
    // the stale handle's guards must refresh off the listing gap and
    // fail loudly instead of serving the retained tail as a full feed
    intercept[IllegalArgumentException] { a.changesSince(3L).count() }
    intercept[IllegalArgumentException] { a.snapshot(4L).count() }
    intercept[IllegalArgumentException] {
      a.snapshotForKeys(df.limit(1).select("o_orderkey"), 4L).count()
    }
    // recorded-count windows below the floor force the loud fallback
    // instead of summing only retained commits (a zero sum would let a
    // drain silently skip the truncated changes)
    assert(a.changeCountsBetween(3L, 6L).isEmpty)
    // retained windows still serve through the same stale handle
    assert(a.changesSince(4L).count() == 4L)
    assert(a.changeCountsBetween(4L, 6L).isDefined)
  }

  test("truncateLog is crash-retryable past a stranded checkpoint sidecar") {
    val root = tmp()
    val (t, _) = mkTable(root)
    val log = new CommitLog(s"$root/t", spark.sessionState.newHadoopConf())
    // simulate a truncateLog that crashed between the manifest-sidecar
    // write and the floor write: the sidecar exists, nothing else moved
    val vs = log.versions()
    val ckptV = vs.takeRight(2).head
    val bv = log.bucketVersions(ckptV)
    val manifest: Map[Int, Seq[FileEntry]] = bv.toSeq.flatMap { case (b, v) =>
      log.readCommit(v).files.flatMap(_.get(b)).map(es => b -> es)
    }.toMap
    log.checkpointWithManifest(ckptV, bv, log.maxBatchIdAt(ckptV), manifest)
    // the retry must overwrite the stranded sidecar, not wedge forever
    t.truncateLog(retainVersions = 2)
    assert(new CommitLog(s"$root/t",
      spark.sessionState.newHadoopConf()).truncationFloor == ckptV - 1)
    assert(KeyedTable.forPath(spark, s"$root/t").snapshot().count() == 200)
  }

  test("a drained pipeline keeps draining across source truncation") {
    import graft.streaming.Stream
    val root = tmp()
    val df = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").limit(300)
    val t = KeyedTable.create(spark, s"$root/src", df.schema, Seq("o_orderkey"),
      numBuckets = 4)
    val pipe = Stream.fromKeyedTable(t)
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .writeToPath(s"$root/out")
    (1 to 4).foreach { i =>
      t.upsert(df.where(col("o_orderkey") % 4 === i - 1), uniqueKeys = true)
    }
    pipe.runIncremental() // watermark = v4
    t.truncateLog(retainVersions = 2) // floor = 2 < watermark — safe
    t.upsert(df.limit(30).withColumn("o_totalprice", lit(1.0)), uniqueKeys = true)
    pipe.runIncremental()
    val out = KeyedTable.forPath(spark, s"$root/out")
    val want = t.snapshot().groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
    val got = out.snapshot().select("o_custkey", "cnt")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("stale checkpoint-name memo retries after a cross-process truncation") {
    // A truncation DELETES superseded _ckpt_* files; another process's
    // warm ckptVersions memo can still list one. latestCheckpointAt
    // must invalidate the memo and retry against a fresh listing on
    // the read miss — not surface FileNotFoundException (and a small
    // upTo must resolve to the clean None, feeding the loud
    // below-floor error upstream).
    val root = tmp()
    val (t, df) = mkTable(root)
    t.truncateLog(retainVersions = 2) // ckpt at v5, the oldest retained
    val conf = spark.sessionState.newHadoopConf()
    val logA = new CommitLog(s"$root/t", conf) // warmed, goes stale
    val logB = new CommitLog(s"$root/t", conf) // warmed, small-upTo probe
    assert(logA.latestCheckpointAt(Long.MaxValue).map(_._1).contains(5L))
    assert(logB.latestCheckpointAt(Long.MaxValue).map(_._1).contains(5L))
    // cross-process: more commits, then a second truncation deletes
    // the superseded _ckpt_5 both warm memos still list
    (7 to 8).foreach { i =>
      t.upsert(df.limit(1).withColumn("o_totalprice", lit(i.toDouble)),
        uniqueKeys = true)
    }
    t.truncateLog(retainVersions = 2)
    val newCkpt = new CommitLog(s"$root/t", conf)
      .latestCheckpointAt(Long.MaxValue).map(_._1)
    assert(newCkpt.exists(_ > 5L), s"second truncation wrote no newer ckpt: $newCkpt")
    assert(logA.latestCheckpointAt(Long.MaxValue).map(_._1) == newCkpt,
      "stale memo must retry to the fresh checkpoint, not throw")
    // a time-travel-style upTo below the surviving checkpoint: the
    // stale memo's hit is gone — clean None after the retry, not FNF
    assert(logB.latestCheckpointAt(5L).isEmpty)
  }
}
