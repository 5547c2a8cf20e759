package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import java.nio.file.Files

class RebucketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("rb").toString

  private def dataDirs(path: String, v: Long): Seq[String] = {
    val log = new CommitLog(path, spark.sessionState.newHadoopConf())
    val p = new org.apache.hadoop.fs.Path(s"$path/data/${log.dirOf(v)}")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName).filter(_.startsWith("b="))
  }

  test("rebucket preserves contents, changes layout, emits no cdf") {
    val t = tmp()
    val df = (1L to 500L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 16)
    kt.upsert(df, uniqueKeys = true)
    val before = kt.snapshot().orderBy("id").collect()
    val cdfBefore = kt.changesSince(0L).count()

    val v = kt.rebucket(4)
    assert(kt.meta.numBuckets == 4)
    assert(dataDirs(t, v).length <= 4 && dataDirs(t, v).nonEmpty)
    assert(kt.snapshot().orderBy("id").collect().toSeq == before.toSeq)
    // layout-only: downstream incremental stages see zero new change rows
    assert(kt.changesSince(0L).count() == cdfBefore)
  }

  test("time-travel point reads to a PRE-rebucket version hash with that version's modulus") {
    // probing the old layout with the current modulus silently returns
    // missing rows — the read must use the version's own recorded epoch
    val t = tmp()
    val df = (1L to 400L).map(i => (i, i * 2.0)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df, uniqueKeys = true)
    val v1 = kt.latestVersion
    kt.rebucket(16)
    kt.upsert(Seq((7L, 777.0)).toDF("id", "v"), uniqueKeys = true)
    // current read sees the new value under the new modulus
    val cur = kt.snapshotForKeys(Seq(7L).toDF("id")).collect()
    assert(cur.length == 1 && cur.head.getDouble(1) == 777.0)
    // historical read at v1 (modulus 4): must find every probed key
    val probes = Seq(7L, 123L, 399L).toDF("id")
    val got = kt.snapshotForKeys(probes, v1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(7L -> 14.0, 123L -> 246.0, 399L -> 798.0),
      s"cross-epoch time-travel point read returned $got")
  }

  test("merges after rebucket prune with the new modulus") {
    val t = tmp()
    val df = (1L to 300L).map(i => (i, i.toDouble)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 32)
    kt.upsert(df, uniqueKeys = true)
    kt.rebucket(8)
    // update one key: the commit must rewrite exactly the ONE bucket the
    // new modulus assigns it to
    val v = kt.upsert(Seq((7L, 700.0)).toDF("id", "v"), uniqueKeys = true)
    assert(dataDirs(t, v).length == 1)
    val m = kt.snapshot().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(7L) == 700.0 && m.size == 300)
    // time travel across the rebucket boundary still replays the old layout
    assert(kt.snapshot(1).count() == 300)
  }

  test("optimize clusters rows within bucket files; contents unchanged") {
    val t = tmp()
    // shuffle insertion order so files start unclustered
    val df = (1L to 400L).map(i => ((i * 131) % 400 + 1, ((i * 17) % 97).toDouble))
      .toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df, uniqueKeys = true)
    val before = kt.snapshot().orderBy("id").collect()
    val cdfBefore = kt.changesSince(0L).count()
    val ver = kt.optimize(Seq("v"))
    assert(kt.meta.numBuckets == 4)
    assert(kt.snapshot().orderBy("id").collect().toSeq == before.toSeq)
    assert(kt.changesSince(0L).count() == cdfBefore, "optimize is layout-only")
    // every rewritten bucket file is sorted by the cluster column
    val lg = new CommitLog(t, spark.sessionState.newHadoopConf())
    val vdir = new org.apache.hadoop.fs.Path(s"$t/data/${lg.dirOf(ver)}")
    val fs = vdir.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(vdir).flatMap(b => fs.listStatus(b.getPath))
      .map(_.getPath.toString).filter(_.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val vals = spark.read.parquet(f).select("v").collect().map(_.getDouble(0))
      assert(vals.sameElements(vals.sorted), s"file not clustered: $f")
    }
  }

  test("z-order clusters BOTH columns; lexicographic only the prefix") {
    // 64×64 grid in one bucket file; a "row group" of 256 consecutive
    // rows under z-order covers a ~16×16 tile (y-range ≈ 16), while
    // lexicographic (x, y) sweeps y's FULL range in every block
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      ((x * 64 + y).toLong, x.toDouble, y.toDouble)))
    val df = grid.toDF("id", "x", "y")
    def meanBlockRangeY(t: String, ver: Long): Double = {
      val lg = new CommitLog(t, spark.sessionState.newHadoopConf())
      val vdir = new org.apache.hadoop.fs.Path(s"$t/data/${lg.dirOf(ver)}")
      val fs = vdir.getFileSystem(spark.sessionState.newHadoopConf())
      val files = fs.listStatus(vdir).flatMap(b => fs.listStatus(b.getPath))
        .map(_.getPath.toString).filter(_.endsWith(".parquet"))
      val rows = files.flatMap(f =>
        spark.read.parquet(f).select("y").collect().map(_.getDouble(0)))
      val blocks = rows.grouped(256).filter(_.length > 1).toSeq
      blocks.map(b => b.max - b.min).sum / blocks.size
    }
    val tLex = tmp()
    val ktLex = KeyedTable.create(spark, tLex, df.schema, keys = Seq("id"), numBuckets = 1)
    ktLex.upsert(df, uniqueKeys = true)
    val vLex = ktLex.optimize(Seq("x", "y"))
    val tZ = tmp()
    val ktZ = KeyedTable.create(spark, tZ, df.schema, keys = Seq("id"), numBuckets = 1)
    ktZ.upsert(df, uniqueKeys = true)
    val vZ = ktZ.optimizeZOrder(Seq("x", "y"), bits = 6)
    assert(ktZ.snapshot().count() == 4096)
    val (lexY, zY) = (meanBlockRangeY(tLex, vLex), meanBlockRangeY(tZ, vZ))
    assert(zY < lexY * 0.5,
      s"z-order y-locality $zY must beat lexicographic $lexY by 2x+")
  }

  test("autoRebucket grows to the smallest sufficient power of two") {
    val t = tmp()
    val df = (1L to 2000L).map(i => (i, s"payload_$i" * 10)).toDF("id", "s")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 2)
    kt.upsert(df, uniqueKeys = true)
    // a tiny per-bucket target forces growth; contents must be intact
    assert(kt.autoRebucket(targetBucketBytes = 8 * 1024, maxBuckets = 64).nonEmpty)
    assert(kt.meta.numBuckets > 2 && Integer.bitCount(kt.meta.numBuckets) == 1)
    assert(kt.meta.numBuckets <= 64)
    assert(kt.snapshot().count() == 2000)
    // already sized: second call is a no-op
    val before = kt.latestVersion
    assert(kt.autoRebucket(targetBucketBytes = Long.MaxValue / 2).isEmpty)
    assert(kt.latestVersion == before)
  }

  test("crash before commit rolls back; crash before meta swap rolls forward") {
    val t = tmp()
    val df = (1L to 100L).map(i => (i, i.toString)).toDF("id", "s")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 16)
    kt.upsert(df, uniqueKeys = true)
    val log = new CommitLog(t, spark.sessionState.newHadoopConf())

    // (a) marker written, no commit (crash mid data-write) → roll back
    // once the attempt is provably dead (grace elapsed); a FRESH marker
    // must be left for the possibly-live attempt
    log.writeRebucketMarker(99L, 4, "v=99-deadbeef")
    KeyedTable.forPath(spark, t) // default grace: marker is fresh → kept
    assert(log.readRebucketMarker().nonEmpty,
      "a fresh uncommitted marker may belong to a live rewrite — keep it")
    spark.conf.set("spark.graft.pendingGraceMs", "-1")
    val kt2 = try KeyedTable.forPath(spark, t)
      finally spark.conf.unset("spark.graft.pendingGraceMs")
    assert(log.readRebucketMarker().isEmpty)
    assert(kt2.meta.numBuckets == 16)
    assert(kt2.snapshot().count() == 100)

    // (b) marker + commit present, meta still old (crash before meta
    // swap): simulate by completing a real rebucket then restoring the
    // OLD meta + marker — recovery must finish the meta swap
    val v = kt2.rebucket(4)
    val oldMeta = kt2.meta.copy(numBuckets = 16)
    log.writeMeta(
      // re-serialize via a fresh create round-trip: simplest is direct edit
      log.readMeta().replace("\"numBuckets\":4", "\"numBuckets\":16"))
    log.writeRebucketMarker(v, 4, log.dirOf(v))
    val kt3 = KeyedTable.forPath(spark, t)
    assert(kt3.meta.numBuckets == 4, "recovery must roll the meta swap forward")
    assert(log.readRebucketMarker().isEmpty)
    assert(kt3.snapshot().count() == 100)
    assert(oldMeta.numBuckets == 16) // silence unused warning
  }

  test("a LIVE losing rewrite's scratch survives foreign recovery, then replays clean") {
    // forces the exact r13 race: rewrite publishes its marker, a
    // concurrent writer claims the marker's version, ANOTHER handle's
    // merge runs recovery(onlyDead=true) — the still-live loser's marker
    // and scratch must survive (pre-fix, recovery deleted them out from
    // under the in-flight write and the rewrite crashed on chmod)
    val t = tmp()
    val df = (1L to 400L).map(i => (i, i.toString)).toDF("id", "s")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df, uniqueKeys = true)
    val log = new CommitLog(t, spark.sessionState.newHadoopConf())
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    @volatile var hookRan = false
    KeyedTable.globalPreRebucketWriteHook = { _ =>
      if (!hookRan) { // first attempt only; the replay must run clean
        hookRan = true
        val (mv, _, mdir) = log.readRebucketMarker().get
        // stand in for the in-flight write: a fresh scratch subtree
        val sentinel = new org.apache.hadoop.fs.Path(s"$t/_tmp_$mdir/sentinel")
        fs.mkdirs(sentinel)
        // (1) a concurrent writer claims the marker's version
        val w = KeyedTable.forPath(spark, t)
        w.upsert(Seq((401L, "x")).toDF("id", "s"), uniqueKeys = true)
        assert(w.latestVersion == mv, "writer must claim the marker's version")
        // (2) a foreign merge's claim path runs recovery(onlyDead=true)
        KeyedTable.forPath(spark, t)
          .upsert(Seq((402L, "y")).toDF("id", "s"), uniqueKeys = true)
        // pre-fix both of these failed: marker cleared, scratch deleted
        assert(log.readRebucketMarker().exists(_._3 == mdir),
          "foreign recovery reclaimed a live loser's marker")
        assert(fs.exists(sentinel),
          "foreign recovery reclaimed a live loser's scratch mid-write")
      }
    }
    try {
      kt.rebucket(8) // loses its first claim, must replay cleanly
      assert(hookRan)
      assert(kt.meta.numBuckets == 8)
      assert(kt.snapshot().count() == 402)
      assert(log.readRebucketMarker().isEmpty)
    } finally KeyedTable.globalPreRebucketWriteHook = _ => ()
  }

  // ---- stepped rebucket (rebucketIncremental, r15) -----------------------

  test("stepped rebucket: contents preserved, modulus swapped, layout-only, progress cleaned") {
    val t = tmp()
    val df = (1L to 500L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df, uniqueKeys = true)
    val before = kt.snapshot().orderBy("id").collect()
    val cdfBefore = kt.changesSince(0L).count()
    val log = new CommitLog(t, spark.sessionState.newHadoopConf())

    // maxStepBytes=1 forces one live bucket per range → a real multi-step run
    val v = kt.rebucketIncremental(16, maxStepBytes = 1)
    assert(kt.meta.numBuckets == 16)
    assert(KeyedTable.lastRebucketStepsRun == 4, "4 live buckets → 4 steps")
    assert(kt.snapshot().orderBy("id").collect().toSeq == before.toSeq)
    assert(kt.changesSince(0L).count() == cdfBefore, "stepped rebucket is layout-only")
    assert(log.readRebucketProgress().isEmpty, "progress record must be dropped")
    assert(log.readRebucketMarker().isEmpty)
    // the cutover manifest references the staging dirs — reads work and
    // a follow-up point merge prunes with the NEW modulus
    val v2 = kt.upsert(Seq((7L, "x", 700.0)).toDF("id", "name", "v"), uniqueKeys = true)
    assert(v2 == v + 1)
    val got = kt.snapshotForKeys(Seq(7L).toDF("id")).collect()
    assert(got.length == 1 && got.head.getDouble(2) == 700.0)
    // non-multiple and shrink targets are rejected (monolithic path's job)
    intercept[IllegalArgumentException](kt.rebucketIncremental(24))
    intercept[IllegalArgumentException](kt.rebucketIncremental(8))
  }

  test("stepped rebucket: crash mid-sequence resumes from the progress record") {
    val t = tmp()
    val df = (1L to 500L).map(i => (i, i.toDouble)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df, uniqueKeys = true)
    val log = new CommitLog(t, spark.sessionState.newHadoopConf())
    // crash (exception) at the THIRD range's step
    var steps = 0
    KeyedTable.globalRebucketStepHook = { (_, _) =>
      steps += 1
      if (steps == 3) sys.error("injected crash at step 3")
    }
    try intercept[RuntimeException](kt.rebucketIncremental(8, maxStepBytes = 1))
    finally KeyedTable.globalRebucketStepHook = (_, _) => ()
    assert(log.readRebucketProgress().exists(_._4.size == 2),
      "two completed steps must be recorded")
    assert(kt.meta.numBuckets == 4, "no cutover happened")
    assert(kt.snapshot().count() == 500, "staged dirs are invisible to readers")
    // resume with a DIFFERENT byte budget (the default): the adopted
    // steps' recorded ranges must be KEPT and only the uncovered gap
    // re-split — a fresh whole-table split would leave a stale `done`
    // range that the dirty diff never re-examines but the cutover
    // still assembles, duplicating rows (grace waived for the test)
    spark.conf.set("spark.graft.pendingGraceMs", "-1")
    try kt.rebucketIncremental(8)
    finally spark.conf.unset("spark.graft.pendingGraceMs")
    assert(KeyedTable.lastRebucketStepsRun == 1,
      s"resume must adopt the 2 recorded steps and run the 2-bucket gap " +
        s"as ONE default-budget step, ran ${KeyedTable.lastRebucketStepsRun}")
    assert(kt.meta.numBuckets == 8)
    assert(kt.snapshot().count() == 500, "row duplication across adopted+gap ranges")
    assert(kt.snapshot().select("id").distinct().count() == 500)
    assert(kt.snapshot().agg(sum("v")).head.getDouble(0) == (1L to 500L).map(_.toDouble).sum)
    assert(log.readRebucketProgress().isEmpty)
  }

  test("stepped rebucket: a racing writer dirties one range and costs ONE redo") {
    val t = tmp()
    val df = (1L to 500L).map(i => (i, i.toDouble)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df, uniqueKeys = true)
    // a key in old bucket 0 (modulus 4) — its update dirties range lo=0
    val key0 = (1L to 500L).find(i =>
      Seq(i).toDF("id").select(pmod(xxhash64(col("id")), lit(4)).cast("int"))
        .head.getInt(0) == 0).get
    // inject the racing upsert while the LAST range's step runs — range 0
    // completed long before, so the cutover must detect it dirty
    var injected = false
    KeyedTable.globalRebucketStepHook = { (_, lo) =>
      if (lo == 3 && !injected) {
        injected = true
        KeyedTable.forPath(spark, t)
          .upsert(Seq((key0, -1.0)).toDF("id", "v"), uniqueKeys = true)
      }
    }
    try kt.rebucketIncremental(8, maxStepBytes = 1)
    finally KeyedTable.globalRebucketStepHook = (_, _) => ()
    assert(injected)
    assert(KeyedTable.lastRebucketStepsRun == 5,
      s"4 ranges + exactly ONE redo, ran ${KeyedTable.lastRebucketStepsRun}")
    assert(kt.meta.numBuckets == 8)
    val m = kt.snapshot().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m.size == 500 && m(key0) == -1.0,
      "the racing write must survive the cutover")
  }

  test("stepped rebucket: a lost cutover claim replays only the dirtied range") {
    val t = tmp()
    val df = (1L to 500L).map(i => (i, i.toDouble)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df, uniqueKeys = true)
    // the instance hook fires right before the cutover claim (steps do
    // not commit): a concurrent writer steals the version there
    var fired = false
    kt.preCommitHook = () => if (!fired) {
      fired = true
      KeyedTable.forPath(spark, t)
        .upsert(Seq((1L, -1.0)).toDF("id", "v"), uniqueKeys = true)
    }
    try kt.rebucketIncremental(8, maxStepBytes = 1)
    finally kt.preCommitHook = () => ()
    assert(fired)
    assert(KeyedTable.lastRebucketStepsRun == 5,
      s"4 ranges + one redo after the lost claim, ran ${KeyedTable.lastRebucketStepsRun}")
    assert(kt.meta.numBuckets == 8)
    val m = kt.snapshot().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m.size == 500 && m(1L) == -1.0)
    val log = new CommitLog(t, spark.sessionState.newHadoopConf())
    assert(log.readRebucketProgress().isEmpty && log.readRebucketMarker().isEmpty)
  }

  test("stepped rebucket: crash between cutover commit and meta swap rolls forward") {
    val t = tmp()
    val df = (1L to 200L).map(i => (i, i.toDouble)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df, uniqueKeys = true)
    val log = new CommitLog(t, spark.sessionState.newHadoopConf())
    val v = kt.rebucketIncremental(8, maxStepBytes = 1)
    // restore the pre-swap state: old meta + marker + progress record
    log.writeMeta(log.readMeta().replace("\"numBuckets\":8", "\"numBuckets\":4"))
    log.writeRebucketMarker(v, 8, log.dirOf(v))
    log.writeRebucketProgress(8, 4, "deadbeef", Seq((0, 4, "", Nil)))
    val kt2 = KeyedTable.forPath(spark, t)
    assert(kt2.meta.numBuckets == 8, "recovery must finish the meta swap")
    assert(log.readRebucketMarker().isEmpty)
    assert(log.readRebucketProgress().isEmpty,
      "a completed run's stale progress record must be dropped on roll-forward")
    assert(kt2.snapshot().count() == 200)
  }

  test("vacuum reclaims dead orphan staging dirs, protects live-progress and referenced ones") {
    val t = tmp()
    val df = (1L to 300L).map(i => (i, i.toDouble)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 2)
    kt.upsert(df, uniqueKeys = true)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val log = new CommitLog(t, spark.sessionState.newHadoopConf())
    // referenced staging dirs: a completed stepped rebucket's files live
    // under rbstep-* and are reachable through the cutover manifest
    kt.rebucketIncremental(4, maxStepBytes = 1)
    val live = fs.listStatus(new org.apache.hadoop.fs.Path(s"$t/data"))
      .map(_.getPath.getName).filter(_.startsWith("rbstep-"))
    assert(live.nonEmpty)
    // an orphan staging dir (crashed run, no progress record) and one
    // claimed by a live progress record
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$t/data/rbstep-orphan-0-x"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$t/data/rbstep-claimed-0-y"))
    log.writeRebucketProgress(8, 4, "claimed",
      Seq((0, 1, "rbstep-claimed-0-y", Seq((0, 1L)))))
    spark.conf.set("spark.graft.pendingGraceMs", "-1")
    try kt.vacuum(retainVersions = 1)
    finally spark.conf.unset("spark.graft.pendingGraceMs")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$t/data/rbstep-orphan-0-x")),
      "dead orphan staging must be reclaimed")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$t/data/rbstep-claimed-0-y")),
      "a live progress record's staging dir must survive vacuum")
    live.foreach(d => assert(fs.exists(new org.apache.hadoop.fs.Path(s"$t/data/$d")),
      s"manifest-referenced staging dir $d must survive vacuum"))
    assert(kt.snapshot().count() == 300)
    log.clearRebucketProgress()
  }

  test("a provably DEAD losing rewrite is reclaimed on the merge claim path") {
    val t = tmp()
    val df = (1L to 100L).map(i => (i, i.toString)).toDF("id", "s")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df, uniqueKeys = true)
    val v = kt.latestVersion
    val log = new CommitLog(t, spark.sessionState.newHadoopConf())
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // a crashed loser: marker names a committed version under a
    // DIFFERENT dir, orphan data + scratch dirs left behind
    val orphan = s"v=$v-feedface"
    log.writeRebucketMarker(v, 8, orphan)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$t/data/$orphan"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$t/_tmp_$orphan"))
    // fresh evidence → the merge path must keep everything
    kt.upsert(Seq((101L, "x")).toDF("id", "s"), uniqueKeys = true)
    assert(log.readRebucketMarker().nonEmpty, "fresh attempt must be kept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$t/data/$orphan")))
    // grace elapsed → the same path reclaims marker + both dirs
    spark.conf.set("spark.graft.pendingGraceMs", "-1")
    try kt.upsert(Seq((102L, "y")).toDF("id", "s"), uniqueKeys = true)
    finally spark.conf.unset("spark.graft.pendingGraceMs")
    assert(log.readRebucketMarker().isEmpty, "dead attempt must be reclaimed")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$t/data/$orphan")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$t/_tmp_$orphan")))
    assert(kt.snapshot().count() == 102)
  }
}
