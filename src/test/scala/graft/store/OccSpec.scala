package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import java.nio.file.Files

/** Optimistic multi-writer concurrency (SURVEY §6g-1): two handles of
  * the same table race on the commit-file rename; the loser replays.
  * Deterministic interleavings are forced through the `preCommitHook`
  * test seam (the hook fires after an attempt's files are written,
  * immediately before its commit claim). */
class OccSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("occ").toString

  private def freshTable(path: String, numBuckets: Int = 8): KeyedTable = {
    val df = (1L to 200L).map(i => (i, 0.0, 0L)).toDF("id", "v", "seq")
    val kt = KeyedTable.create(spark, path, df.schema,
      keys = Seq("id"), seqCols = Seq("seq"), numBuckets = numBuckets)
    kt.upsert(df, uniqueKeys = true)
    kt
  }

  test("loser of a commit race replays; both batches land (overlapping keys)") {
    val t = tmp()
    val h1 = freshTable(t)
    val h2 = KeyedTable.forPath(spark, t)
    val b1 = Seq((5L, 100.0, 1L), (6L, 101.0, 1L)).toDF("id", "v", "seq")
    val b2 = Seq((5L, 200.0, 2L), (7L, 202.0, 2L)).toDF("id", "v", "seq")
    var fired = false
    h2.preCommitHook = () => if (!fired) { fired = true; h1.upsert(b1, uniqueKeys = true) }
    val v2 = h2.upsert(b2, uniqueKeys = true)
    h2.preCommitHook = () => ()
    assert(h2.occRetries == 1, s"expected exactly one lost claim, got ${h2.occRetries}")
    assert(v2 == h1.latestVersion && v2 == 3L, s"loser must land at the next version, got $v2")
    val m = KeyedTable.forPath(spark, t).snapshot()
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // key 5 was written by both: seq 2 (h2) wins the re-merge
    assert(m(5L) == 200.0, s"latest-wins re-merge broke: ${m(5L)}")
    assert(m(6L) == 101.0 && m(7L) == 202.0)
    assert(m.size == 200) // keys 5-7 all existed in the seed: no inserts
  }

  test("disjoint-bucket loser re-stamps its cdf instead of re-merging") {
    val t = tmp()
    val h1 = freshTable(t, numBuckets = 4)
    val h2 = KeyedTable.forPath(spark, t)
    // split keys by the table's own bucket assignment so the two
    // batches provably touch disjoint buckets
    val buckets = (1L to 200L).toDF("id")
      .withColumn("b", pmod(xxhash64(col("id")), lit(4)).cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val keys1 = (1L to 200L).filter(k => buckets(k) == 0).take(5)
    val keys2 = (1L to 200L).filter(k => buckets(k) == 1).take(5)
    assert(keys1.nonEmpty && keys2.nonEmpty)
    val b1 = keys1.map(k => (k, 111.0, 1L)).toDF("id", "v", "seq")
    val b2 = keys2.map(k => (k, 222.0, 1L)).toDF("id", "v", "seq")
    var fired = false
    h2.preCommitHook = () => if (!fired) { fired = true; h1.upsert(b1, uniqueKeys = true) }
    val v2 = h2.upsert(b2, uniqueKeys = true)
    h2.preCommitHook = () => ()
    assert(h2.occRetries == 1 && h2.occRestamps == 1,
      s"disjoint loser must take the re-stamp path (retries=${h2.occRetries}, restamps=${h2.occRestamps})")
    // the re-stamped change rows must carry the FINAL commit version
    val fresh = KeyedTable.forPath(spark, t)
    val cdfRows = fresh.changesSince(v2 - 1)
      .where(col("_change_type") === "update_postimage")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(4)))
    assert(cdfRows.nonEmpty && cdfRows.forall(_._3 == v2),
      s"re-stamped cdf rows carry a stale version: ${cdfRows.toSeq}")
    assert(cdfRows.map(_._1).toSet == keys2.toSet)
    val m = fresh.snapshot().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    keys1.foreach(k => assert(m(k) == 111.0))
    keys2.foreach(k => assert(m(k) == 222.0))
  }

  test("pending change rows are invisible until the claim wins") {
    val t = tmp()
    val h1 = freshTable(t)
    val h2 = KeyedTable.forPath(spark, t)
    val base = h1.latestVersion
    var pendingSeen = -1L
    h2.preCommitHook = () => if (pendingSeen < 0) {
      // files are written, commit not yet claimed: a reader must see nothing
      pendingSeen = KeyedTable.forPath(spark, t).changesSince(base).count()
    }
    h2.upsert(Seq((9L, 9.0, 1L)).toDF("id", "v", "seq"), uniqueKeys = true)
    h2.preCommitHook = () => ()
    assert(pendingSeen == 0L,
      s"uncommitted attempt leaked $pendingSeen change rows to a reader")
    assert(KeyedTable.forPath(spark, t).changesSince(base).count() == 2L) // pre+post image
  }

  test("crash between claim and publish rolls forward on next open") {
    val t = tmp()
    val h = freshTable(t)
    val base = h.latestVersion
    h.upsert(Seq((3L, 33.0, 1L)).toDF("id", "v", "seq"), uniqueKeys = true)
    val v = h.latestVersion
    // simulate the crash window: the commit exists but its change rows
    // are still in the pending area
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val lg = new CommitLog(t, spark.sessionState.newHadoopConf())
    val dir = lg.dirOf(v)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$t/_cdf_pending"))
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$t/cdf/$dir"),
      new org.apache.hadoop.fs.Path(s"$t/_cdf_pending/$dir")))
    // readers that don't run recovery can't see the stranded rows
    assert(h.changesSince(base).count() == 0L)
    // re-open publishes the stranded rows
    val recovered = KeyedTable.forPath(spark, t)
    assert(recovered.changesSince(base).count() == 2L) // pre+post image
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$t/_cdf_pending/$dir")))
  }

  /** Drives the disjoint-bucket race so the surviving loser COMMITS a
    * version whose dir name prefix is LOWER than the version (the cdf
    * re-stamp path) — the layout both recovery fixes are about. Returns
    * (winning version, its dir name). */
  private def restampedCommit(t: String): (Long, String) = {
    val h1 = freshTable(t, numBuckets = 4)
    val h2 = KeyedTable.forPath(spark, t)
    val buckets = (1L to 200L).toDF("id")
      .withColumn("b", pmod(xxhash64(col("id")), lit(4)).cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val keys1 = (1L to 200L).filter(k => buckets(k) == 0).take(5)
    val keys2 = (1L to 200L).filter(k => buckets(k) == 1).take(5)
    val b1 = keys1.map(k => (k, 111.0, 1L)).toDF("id", "v", "seq")
    val b2 = keys2.map(k => (k, 222.0, 1L)).toDF("id", "v", "seq")
    var fired = false
    h2.preCommitHook = () => if (!fired) { fired = true; h1.upsert(b1, uniqueKeys = true) }
    val v2 = h2.upsert(b2, uniqueKeys = true)
    h2.preCommitHook = () => ()
    assert(h2.occRestamps == 1)
    val lg = new CommitLog(t, spark.sessionState.newHadoopConf())
    val dir = lg.dirOf(v2)
    // precondition of the whole scenario: name prefix < commit version
    assert(dir.stripPrefix("v=").takeWhile(_.isDigit).toLong < v2)
    (v2, dir)
  }

  test("restamped commit's stranded cdf rolls forward on open, not deleted") {
    val t = tmp()
    val (v2, dir) = restampedCommit(t)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // crash window: commit v2 exists, change rows stranded under pending.
    // The dir name parses to a LOWER version owned by the competitor, so
    // prefix-based recovery would wrongly delete committed v2's rows.
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$t/cdf/$dir"),
      new org.apache.hadoop.fs.Path(s"$t/_cdf_pending/$dir")))
    val recovered = KeyedTable.forPath(spark, t)
    assert(recovered.changesSince(v2 - 1).count() == 10L, // 5 keys × pre+post
      "restamped commit's change rows were lost by open recovery")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$t/_cdf_pending/$dir")))
  }

  test("vacuum retains a restamped commit's cdf within the retention window") {
    val t = tmp()
    val (v2, dir) = restampedCommit(t)
    val kt = KeyedTable.forPath(spark, t)
    kt.vacuum(retainVersions = 1) // cutoff == v2; dir prefix < v2
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$t/cdf/$dir")),
      "vacuum deleted a retained commit's cdf dir by its stale name prefix")
    assert(kt.changesSince(v2 - 1).count() == 10L)
  }

  test("vacuum spares young unowned pending dirs, reaps them past the grace period") {
    val t = tmp()
    val kt = freshTable(t)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = new org.apache.hadoop.fs.Path(s"$t/_cdf_pending/v=99-deadbeef")
    fs.mkdirs(orphan)
    kt.vacuum(retainVersions = 1)
    assert(fs.exists(orphan), "vacuum reaped an in-flight attempt's pending dir")
    spark.conf.set("spark.graft.pendingGraceMs", "-1")
    try {
      kt.vacuum(retainVersions = 1)
      assert(!fs.exists(orphan), "vacuum never reaps dead pending dirs")
    } finally spark.conf.unset("spark.graft.pendingGraceMs")
  }

  test("vacuum reaps dead fused-write scratch dirs, spares active ones") {
    val t = tmp()
    val kt = freshTable(t)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dead = new org.apache.hadoop.fs.Path(s"$t/_tmp_v=9-deadbeef")
    val live = new org.apache.hadoop.fs.Path(s"$t/_tmp_v=9-cafecafe")
    fs.mkdirs(dead); fs.mkdirs(live)
    // the dead dir sat unmodified past the grace period; the live one
    // has a freshly-written child (a long write's task commits)
    fs.setTimes(dead, System.currentTimeMillis() - 3600_000L, -1)
    fs.setTimes(live, System.currentTimeMillis() - 3600_000L, -1)
    fs.mkdirs(new org.apache.hadoop.fs.Path(live, "__side=c"))
    kt.vacuum(retainVersions = 1)
    assert(!fs.exists(dead), "vacuum left a dead fused-write scratch dir")
    assert(fs.exists(live), "vacuum reaped an in-flight write's scratch dir")
  }

  // Repeated because the historical failure here was a genuine race:
  // Hadoop's LOCAL rename is check-then-clobber (Hive's
  // ProxyLocalFileSystem pre-checks isFile(dst), RawLocalFileSystem is
  // POSIX rename(2)), so before AtomicClaim two simultaneous commit
  // claims for the same version could BOTH "win" — one commit file
  // overwrote the other and a merge silently vanished (~1-in-8 runs).
  // Content is asserted FIRST so a failure distinguishes lost data from
  // collapsed-but-complete versions.
  test("two threads × five merges race to a consistent table") {
    val reps = sys.env.getOrElse("GRAFT_OCC_RACE_REPS", "10").toInt
    (1 to reps).foreach { rep =>
      val t = tmp()
      freshTable(t)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def writer(offset: Long): Thread = new Thread {
        override def run(): Unit = try {
          val h = KeyedTable.forPath(spark, t)
          (1 to 5).foreach { i =>
            val keys = (offset until offset + 10)
            h.upsert(keys.map(k => (k, i.toDouble, i.toLong)).toDF("id", "v", "seq"),
              uniqueKeys = true)
          }
        } catch { case e: Throwable => errs.add(e) }
      }
      val (w1, w2) = (writer(1L), writer(101L))
      w1.start(); w2.start(); w1.join(); w2.join()
      assert(errs.isEmpty, s"rep $rep: writer threw ${errs.peek()}")
      val kt = KeyedTable.forPath(spark, t)
      // 1) content: no batch's effect may be lost
      val m = kt.snapshot().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(m.size == 200, s"rep $rep: snapshot has ${m.size} keys")
      (1L to 10L).foreach(k => assert(m(k) == 5.0, s"rep $rep key $k = ${m(k)}"))
      (101L to 110L).foreach(k => assert(m(k) == 5.0, s"rep $rep key $k = ${m(k)}"))
      // 2) cdf completeness: 10 merges × 10 keys × (pre+post) images
      val cdf = kt.changesSince(1L)
        .groupBy("_commit_version").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cdf.values.sum == 200L,
        s"rep $rep: expected 200 change rows, got $cdf")
      // 3) OCC invariant: exactly one version per winning merge
      assert(cdf.keySet == (2L to 11L).toSet, s"rep $rep cdf versions: $cdf")
      assert(kt.latestVersion == 11L,
        s"rep $rep: 10 merges after seed must land 10 versions, got ${kt.latestVersion}")
    }
  }
}
