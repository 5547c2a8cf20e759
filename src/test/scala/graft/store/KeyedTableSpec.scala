package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import java.nio.file.Files

class KeyedTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("kt").toString

  test("snapshotForKeys reads ONLY the keys' buckets and equals the filter") {
    val t = tmp()
    val df = (1L to 1000L).map(i => (i, i * 1.5)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 16)
    kt.upsert(df, uniqueKeys = true)
    val wanted = Seq(7L, 8L).toDF("id")
    val got = kt.snapshotForKeys(wanted)
    assert(got.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap ==
      Map(7L -> 10.5, 8L -> 12.0))
    // point reads must prune at the FILE level, not post-scan
    val full = kt.snapshot().inputFiles.length
    val pruned = got.inputFiles.length
    assert(full == 16 && pruned <= 2,
      s"lookup read $pruned of $full bucket files — pruning failed")
  }

  test("upsert inserts then updates, snapshot reflects latest") {
    val t = tmp()
    val df1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    val kt = KeyedTable.create(spark, t, df1.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df1)
    assert(kt.snapshot().count() == 2)
    val df2 = Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    kt.upsert(df2)
    val snap = kt.snapshot().orderBy("id").collect()
    assert(snap.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(snap(1).getString(1) == "b2")
    assert(kt.latestVersion == 2)
  }

  test("sequence column: stale update loses, newer wins") {
    val t = tmp()
    val df1 = Seq((1L, "v1", 100L), (2L, "v1", 100L)).toDF("id", "payload", "seq")
    val kt = KeyedTable.create(spark, t, df1.schema, keys = Seq("id"), seqCols = Seq("seq"))
    kt.upsert(df1)
    kt.upsert(Seq((1L, "stale", 50L), (2L, "fresh", 200L)).toDF("id", "payload", "seq"))
    val m = kt.snapshot().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "v1")   // seq 50 < 100 → rejected
    assert(m(2L) == "fresh") // seq 200 > 100 → applied
  }

  test("batch-internal duplicates: highest seq wins") {
    val t = tmp()
    val df = Seq((1L, "old", 1L), (1L, "new", 2L)).toDF("id", "p", "seq")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), seqCols = Seq("seq"))
    kt.upsert(df)
    assert(kt.snapshot().collect().head.getString(1) == "new")
  }

  test("cdf records inserts and update pre/post images") {
    val t = tmp()
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("id", "x")
    val kt = KeyedTable.create(spark, t, df1.schema, keys = Seq("id"))
    kt.upsert(df1)
    kt.upsert(Seq((2L, "b2"), (3L, "c")).toDF("id", "x"))
    val changes = kt.changesSince(0L)
      .select("id", "x", "_change_type", "_commit_version").collect()
    val v1 = changes.filter(_.getLong(3) == 1L)
    assert(v1.forall(_.getString(2) == "insert") && v1.length == 2)
    val v2 = changes.filter(_.getLong(3) == 2L)
    assert(v2.count(_.getString(2) == "insert") == 1)
    assert(v2.count(_.getString(2) == "update_preimage") == 1)
    assert(v2.count(_.getString(2) == "update_postimage") == 1)
    val pre = v2.find(_.getString(2) == "update_preimage").get
    assert(pre.getLong(0) == 2L && pre.getString(1) == "b")
  }

  test("agg-style merge with custom update expressions") {
    val t = tmp()
    val df1 = Seq(("g1", 10.0, 1L), ("g2", 20.0, 1L)).toDF("k", "total", "cnt")
    val kt = KeyedTable.create(spark, t, df1.schema, keys = Seq("k"))
    kt.merge(df1, MergeSpec())
    val spec = MergeSpec(updateExprs = Some(Map(
      "total" -> (col("u.total") + col("s.total")),
      "cnt" -> (col("u.cnt") + col("s.cnt")))))
    kt.merge(Seq(("g1", 5.0, 1L), ("g3", 7.0, 1L)).toDF("k", "total", "cnt"), spec)
    val m = kt.snapshot().collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(m("g1") == (15.0, 2L))
    assert(m("g2") == (20.0, 1L))
    assert(m("g3") == (7.0, 1L))
  }

  test("placeholder upgrade: unmatched left-join row claimed by match") {
    val t = tmp()
    // join-output table: key = (lid, rid), rid nullable (left join)
    val df1 = Seq((1L, Option(10L), "joined"), (2L, Option.empty[Long], "unmatched"))
      .toDF("lid", "rid", "payload")
    val kt = KeyedTable.create(spark, t, df1.schema,
      keys = Seq("lid", "rid"), nullableKeys = Seq("rid"), numBuckets = 4)
    kt.merge(df1, MergeSpec())
    assert(kt.snapshot().count() == 2)
    // the match for lid=2 arrives → placeholder row must be UPGRADED, not duplicated
    kt.merge(Seq((2L, Option(20L), "now-joined")).toDF("lid", "rid", "payload"), MergeSpec())
    val rows = kt.snapshot().orderBy("lid").collect()
    assert(rows.length == 2, s"expected upgrade-in-place, got ${rows.mkString(";")}")
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(!r2.isNullAt(1) && r2.getLong(1) == 20L && r2.getString(2) == "now-joined")
    // a second right-side match for lid=2 → genuine new row
    kt.merge(Seq((2L, Option(21L), "second")).toDF("lid", "rid", "payload"), MergeSpec())
    assert(kt.snapshot().where(col("lid") === 2L).count() == 2)
  }

  test("within-batch placeholder image is subsumed by its upgraded row") {
    val t = tmp()
    // one downstream microbatch can carry BOTH the placeholder insert
    // (rid null) and its upgrade (rid filled) when an upstream stage
    // committed both inside the batch's commit range — they are images
    // of the SAME logical row and must collapse to the complete one
    val df = Seq((1L, Option.empty[Long], "placeholder"), (1L, Option(10L), "upgraded"))
      .toDF("lid", "rid", "payload")
    val kt = KeyedTable.create(spark, t, df.schema,
      keys = Seq("lid", "rid"), nullableKeys = Seq("rid"), numBuckets = 4)
    kt.merge(df, MergeSpec(), uniqueKeys = true) // join stages pass uniqueKeys
    val rows = kt.snapshot().collect()
    assert(rows.length == 1, s"expected subsumption, got ${rows.mkString(";")}")
    assert(rows.head.getLong(1) == 10L && rows.head.getString(2) == "upgraded")
    // genuinely distinct matches (both rids non-null) are NOT subsumed
    kt.merge(Seq((2L, Option(20L), "a"), (2L, Option(21L), "b"))
      .toDF("lid", "rid", "payload"), MergeSpec(), uniqueKeys = true)
    assert(kt.snapshot().where(col("lid") === 2L).count() == 2)
  }

  test("generated columns are derived at merge time and survive forPath") {
    val t = tmp()
    val df = Seq((1L, "2024-03-05"), (2L, "2025-11-20")).toDF("id", "d")
      .withColumn("d", col("d").cast("date"))
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"),
      numBuckets = 4,
      partitionCols = Seq("ym"), prunedCols = Seq("ym"),
      generatedCols = Seq("ym" -> "year(d) * 100 + month(d)"))
    kt.upsert(df) // batch does NOT carry ym — the store derives it
    val snap = kt.snapshot().orderBy("id").collect()
    assert(snap.map(_.get(2)).toSeq == Seq(202403, 202511))
    // a writer that DOES provide the column wins (no re-derivation)
    kt.upsert(Seq((3L, "2020-01-01")).toDF("id", "d")
      .withColumn("d", col("d").cast("date")).withColumn("ym", lit(999901)))
    assert(kt.snapshot().where(col("id") === 3L).collect().head.get(2) == 999901)
    // meta round-trip (expr contains spaces, *, + — base64-encoded)
    val reopened = KeyedTable.forPath(spark, t)
    assert(reopened.meta.generatedCols == Seq("ym" -> "year(d) * 100 + month(d)"))
    reopened.upsert(Seq((4L, "2021-06-15")).toDF("id", "d")
      .withColumn("d", col("d").cast("date")))
    assert(reopened.snapshot().where(col("id") === 4L).collect().head.get(2) == 202106)
  }

  test("delete removes rows, emits delete CDF, tombstones emptied buckets") {
    val t = tmp()
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "x")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df)
    kt.delete(Seq(Tuple1(3L), Tuple1(7L)).toDF("id"))
    val snap = kt.snapshot()
    assert(snap.count() == 18)
    assert(snap.where(col("id").isin(3L, 7L)).count() == 0)
    val dels = kt.changesSince(1L).where(col("_change_type") === "delete").collect()
    assert(dels.map(_.getLong(0)).sorted.toSeq == Seq(3L, 7L))
    // delete EVERYTHING: all buckets tombstoned, snapshot empty, reads fine
    kt.delete(df.select("id"))
    assert(kt.snapshot().count() == 0)
    // and the table still accepts new rows afterwards
    kt.upsert(Seq((100L, "z")).toDF("id", "x"))
    assert(kt.snapshot().count() == 1)
  }

  test("vacuum removes unreachable versions but keeps the latest snapshot readable") {
    val t = tmp()
    val df = (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 2)
    kt.upsert(df)
    kt.upsert(df.withColumn("v", col("v") * 2))
    kt.upsert(df.withColumn("v", col("v") * 3))
    kt.vacuum(retainVersions = 1)
    val snap = kt.snapshot().orderBy("id").collect()
    assert(snap.length == 10 && snap.head.getDouble(1) == 3.0)
    // old version dirs gone
    val dataDir = new java.io.File(s"$t/data")
    val vdirs = dataDir.listFiles().map(_.getName).filter(_.startsWith("v=")).sorted
    assert(vdirs.length == 1, s"expected only latest version dir, got ${vdirs.mkString(",")}")
  }

  test("vacuum spares a _tmp_ attempt whose only fresh activity is levels deep") {
    // an in-flight write's files land under _temporary/0/task_*/b=*;
    // level-1 dir mtimes stop moving once those dirs exist — liveness
    // must look at the whole subtree or a long write gets reaped mid-job
    val t = tmp()
    val df = Seq((1L, 1.0)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 2)
    kt.upsert(df)
    val old = System.currentTimeMillis() - 60 * 60 * 1000L
    val deepDir = new java.io.File(s"$t/_tmp_attempt1/_temporary/0/task_x/b=0")
    assert(deepDir.mkdirs())
    val deepFile = new java.io.File(deepDir, "part-0.parquet")
    assert(deepFile.createNewFile())
    // age every DIRECTORY (level-1 included) but keep the deep file fresh
    def ageDirs(f: java.io.File): Unit = {
      if (f.isDirectory) { f.listFiles().foreach(ageDirs); f.setLastModified(old) }
    }
    ageDirs(new java.io.File(s"$t/_tmp_attempt1"))
    deepFile.setLastModified(System.currentTimeMillis())
    spark.conf.set("spark.graft.pendingGraceMs", "60000")
    try {
      kt.vacuum(retainVersions = 1)
      assert(new java.io.File(s"$t/_tmp_attempt1").exists(),
        "a scratch dir with fresh deep activity must be spared")
      // now age the deep file too: provably dead, reaped
      deepFile.setLastModified(old)
      kt.vacuum(retainVersions = 1)
      assert(!new java.io.File(s"$t/_tmp_attempt1").exists(),
        "a fully-stale scratch dir must be reaped")
    } finally spark.conf.unset("spark.graft.pendingGraceMs")
  }

  test("forPath round-trips metadata") {
    val t = tmp()
    val df = Seq((1L, "a", 5L)).toDF("id", "x", "seq")
    KeyedTable.create(spark, t, df.schema, keys = Seq("id"), seqCols = Seq("seq")).upsert(df)
    val kt2 = KeyedTable.forPath(spark, t)
    assert(kt2.meta.keys == Seq("id") && kt2.meta.seqCols == Seq("seq"))
    assert(kt2.snapshot().count() == 1)
  }

  test("log checkpoint: replay from checkpoint matches full replay") {
    val t = tmp()
    val df = Seq.tabulate(20)(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    // 12 commits crosses the checkpoint interval (10)
    (1 to 12).foreach(i => kt.upsert(df.withColumn("v", col("v") + i)))
    val ckpts = new java.io.File(s"$t/_log").listFiles()
      .map(_.getName).filter(_.startsWith("_ckpt_"))
    assert(ckpts.length == 1, s"expected one checkpoint, got ${ckpts.mkString(",")}")
    // a fresh reader (fresh replay cache) must see the same state
    val kt2 = KeyedTable.forPath(spark, t)
    val snap = kt2.snapshot().orderBy("id").collect()
    assert(snap.length == 20 && snap.head.getDouble(1) == 12.0)
    assert(kt2.latestVersion == 12L)
    // checkpoint content agrees with a replay that ignores it
    val log = new CommitLog(t, spark.sessionState.newHadoopConf())
    val full = log.bucketVersions(9L) // before the checkpoint
    assert(full.values.max == 9L)
  }

  test("replayed streaming batchId is a no-op (exactly-once merge)") {
    val t = tmp()
    val delta = Seq(("A", 10L), ("B", 5L)).toDF("k", "total")
    val kt = KeyedTable.create(spark, t, delta.schema, keys = Seq("k"), numBuckets = 2)
    val spec = MergeSpec(updateExprs = Some(Map(
      "total" -> (col("u.total") + col("s.total")))))
    kt.merge(delta, spec, uniqueKeys = true, batchId = 0L)
    kt.merge(delta, spec, uniqueKeys = true, batchId = 0L) // replay: skipped
    kt.merge(delta, spec, uniqueKeys = true, batchId = 1L) // new batch: applied
    val got = kt.snapshot().orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq("A" -> 20L, "B" -> 10L), got.mkString(","))
    // a RECOVERED handle (fresh cache) must still see the marker
    val kt2 = KeyedTable.forPath(spark, t)
    kt2.merge(delta, spec, uniqueKeys = true, batchId = 1L) // replay after restart
    assert(kt2.snapshot().where(col("k") === "A").head.getLong(1) == 20L)
  }

  test("schema evolution: autoMerge widens on merge, old rows null-fill") {
    val t = tmp()
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val kt = KeyedTable.create(spark, t, df1.schema, keys = Seq("id"), numBuckets = 4)
    kt.upsert(df1, uniqueKeys = true)
    // without opting in, the extra column is dropped and schema keeps
    val df2 = Seq((3L, "c", 30.0)).toDF("id", "name", "score")
    kt.upsert(df2, uniqueKeys = true)
    assert(!kt.schema.fieldNames.contains("score"))
    try {
      spark.conf.set("spark.graft.schema.autoMerge", "true")
      kt.upsert(Seq((4L, "d", 40.0)).toDF("id", "name", "score"), uniqueKeys = true)
    } finally spark.conf.unset("spark.graft.schema.autoMerge")
    assert(kt.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    val snap = kt.snapshot().orderBy("id").collect()
    assert(snap.length == 4)
    assert(snap.take(3).forall(_.isNullAt(2)), "pre-evolution rows null-fill")
    assert(snap(3).getDouble(2) == 40.0)
    // evolution is persisted: a fresh handle sees it, cdf still reads,
    // and post-evolution merges keep updating pre-evolution rows
    val kt2 = KeyedTable.forPath(spark, t)
    assert(kt2.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(kt2.changesSince(-1L).count() >= 4)
    kt2.upsert(Seq((1L, "a2", 1.5)).toDF("id", "name", "score"), uniqueKeys = true)
    val r1 = kt2.snapshot().where(col("id") === 1L).head
    assert(r1.getString(1) == "a2" && r1.getDouble(2) == 1.5)
  }

  test("bucket-map cache extends forward incrementally and equals a cold fold") {
    // A stale handle whose cached bucket map lags the log must extend
    // by folding ONLY the missing commits — and the extended map must
    // be byte-identical to a cold checkpoint+tail replay, including
    // across commits that EMPTY a bucket (the -= branch) and a
    // truncation (ownership never rewritten).
    val t = tmp()
    val df = (1L to 64L).map(i => (i, i * 1.0)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 8)
    kt.upsert(df, uniqueKeys = true)
    val a = KeyedTable.forPath(spark, t) // second handle, its own cache
    val warm = a.bucketVersionsAt(a.latestVersion)
    assert(warm.nonEmpty)
    // advance the log under `a`: two sparse waves, then delete EVERY
    // row of one bucket so its entry must vanish from the map
    kt.upsert(Seq((1L, 9.9)).toDF("id", "v"), uniqueKeys = true)
    kt.upsert(Seq((2L, 8.8)).toDF("id", "v"), uniqueKeys = true)
    val bucketOf = kt.snapshot().select(
      col("id"), pmod(xxhash64(col("id")), lit(8)).cast("int").alias("b"))
    val victim = bucketOf.head.getInt(1)
    val victims = bucketOf.where(col("b") === victim).select("id")
    kt.delete(victims)
    val v = kt.latestVersion
    def cold(at: Long) = new CommitLog(t, spark.sessionState.newHadoopConf())
      .bucketVersions(at)
    val extended = a.bucketVersionsAt(v) // forward-extension path
    assert(extended == cold(v),
      s"extended map diverged from cold fold: extended=$extended cold=${cold(v)}")
    assert(!extended.contains(victim), "emptied bucket must drop out")
    // across a truncation the extension must NOT fold synthesized
    // (emptied-blind) records: a handle whose cache predates the floor
    // takes the cold-replay path and still matches
    val b = KeyedTable.forPath(spark, t)
    b.bucketVersionsAt(1L) // pin b's cache below the coming floor
    kt.truncateLog(retainVersions = 2)
    kt.upsert(Seq((3L, 7.7)).toDF("id", "v"), uniqueKeys = true)
    val v2 = kt.latestVersion
    assert(b.bucketVersionsAt(v2) == cold(v2),
      "post-truncation map must match a cold fold (no synthesized fold)")
  }

  test("bucket-map extension survives a STALE floor cache across cross-process truncation") {
    // The hazard the cached-floor guard misses: a long-lived handle
    // loads floor=-1 into its floor cache, ANOTHER process truncates
    // past the handle's cached map version, and versions() freshly
    // lists only the retained tail — the cached-floor guard passes
    // while the fold silently skips every commit in (cached, floor],
    // resurrecting a bucket emptied inside the skipped range. The
    // guard must use the stale-proof floorForRead (listed-head gap
    // detection) and fall through to the cold checkpoint replay.
    val t = tmp()
    val df = (1L to 64L).map(i => (i, i * 1.0)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 8)
    kt.upsert(df, uniqueKeys = true) // v1
    val b = KeyedTable.forPath(spark, t) // the long-lived stale handle
    b.bucketVersionsAt(b.latestVersion) // bvCache = (1, map)
    kt.upsert(Seq((1L, 9.9)).toDF("id", "v"), uniqueKeys = true) // v2
    // this extension loads floor=-1 into b's floor cache — the
    // precondition for the staleness hazard
    b.bucketVersionsAt(b.latestVersion) // bvCache = (2, map)
    // cross-process: empty one whole bucket (v3), then truncate past it
    val bucketOf = kt.snapshot().select(
      col("id"), pmod(xxhash64(col("id")), lit(8)).cast("int").alias("b"))
    val victim = bucketOf.head.getInt(1)
    val survivor = bucketOf.where(col("b") =!= victim).head.getLong(0)
    kt.delete(bucketOf.where(col("b") === victim).select("id")) // v3 empties it
    kt.upsert(Seq((survivor, 8.8)).toDF("id", "v"), uniqueKeys = true) // v4
    kt.truncateLog(retainVersions = 1) // ckpt at v4, floor = 3: v3 GONE from the listing
    kt.upsert(Seq((survivor, 7.7)).toDF("id", "v"), uniqueKeys = true) // v5 tail
    val v = kt.latestVersion
    val cold = new CommitLog(t, spark.sessionState.newHadoopConf())
      .bucketVersions(v)
    assert(!cold.contains(victim), "test setup: victim bucket must be emptied")
    val got = b.bucketVersionsAt(v)
    assert(got == cold,
      s"stale-floor extension resurrected truncated state: got=$got cold=$cold")
    assert(!got.contains(victim),
      "bucket emptied inside the truncated range must not resurrect")
  }
}
