package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import java.nio.file.Files
import java.sql.Date

/** Manifest zone maps + [[GraftFileIndex]] data skipping: commits record
  * per-file [min,max] for a prefix of the data columns (read from the
  * same parquet footers as the key-hash range), and filtered snapshot
  * reads prune whole files driver-side through Spark's normal
  * `dataFilters` pushdown into `FileIndex.listFiles` — Delta-style data
  * skipping on the bucketed layout. The intended loop mirrors Delta's:
  * `optimize(cols)` clusters files by the columns queries filter on,
  * zone maps then skip the files a predicate cannot match. */
class ZoneSkipSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("zskip").toString

  private def withSmallFiles[T](rows: Long)(f: => T): T = {
    spark.conf.set("spark.graft.targetFileRows", rows.toString)
    try f finally spark.conf.unset("spark.graft.targetFileRows")
  }

  /** (rows, files actually scanned) of `df` — reads the scan metric off
    * the executed plan, so it counts files AFTER listFiles pruning. */
  private def runCountingFiles(df: DataFrame): (Long, Long) = {
    // collect() (not count()) so the metrics land on THIS plan — count()
    // executes a derived aggregate plan whose metrics we can't see
    val n = df.collect().length.toLong
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty,
      s"no file scan in plan:\n${df.queryExecution.executedPlan}")
    (n, scans.map(_.metrics("numFiles").value).sum)
  }

  private def manifestOf(t: String, v: Long): Seq[FileEntry] = {
    val lg = new CommitLog(t, spark.sessionState.newHadoopConf())
    lg.readCommit(v).files.getOrElse(sys.error(s"commit $v has no manifest"))
      .values.flatten.toSeq
  }

  /** LIVE file entries of the latest snapshot: each bucket's entries come
    * from the commit that last rewrote it, not just the newest commit. */
  private def liveEntries(t: String, kt: KeyedTable): Seq[FileEntry] = {
    val lg = new CommitLog(t, spark.sessionState.newHadoopConf())
    kt.bucketVersionsAt(kt.latestVersion).toSeq.flatMap { case (b, v) =>
      lg.readCommit(v).files.toSeq.flatMap(_.getOrElse(b, Nil))
    }
  }

  test("optimize clusters files by a column; zone maps then skip files") {
    val t = tmp()
    val schema = Seq((1L, 1, 1.0)).toDF("id", "day", "v").schema
    val kt = KeyedTable.create(spark, t, schema, keys = Seq("id"), numBuckets = 1)
    // seed: days interleave across hash-sorted files — no pruning possible
    val df = (1L to 2500L).map(i => (i, (i % 5).toInt + 1, i * 1.0))
      .toDF("id", "day", "v")
    withSmallFiles(500) { kt.upsert(df, uniqueKeys = true) }
    val entries = manifestOf(t, kt.latestVersion)
    assert(entries.size == 5, s"expected 5 seed files, got ${entries.size}")
    assert(entries.forall(_.stats.contains("day")),
      "every manifest entry must carry zone stats for 'day'")
    val (nPre, fPre) = runCountingFiles(kt.snapshot().where(col("day") === 3))
    assert(nPre == 500 && fPre == 5,
      s"interleaved days must scan all 5 files, scanned $fPre")

    withSmallFiles(500) { kt.optimize(Seq("day")) }
    val opt = manifestOf(t, kt.latestVersion)
    assert(opt.size == 5, s"optimize should rewrite into 5 files, got ${opt.size}")
    // day-clustered files: each file's [min,max] day range is one day
    assert(opt.forall(e => e.stats.get("day").exists(st => st.min == st.max)),
      s"optimize(day) must produce per-day files, stats=${opt.map(_.stats.get("day"))}")

    val (n3, f3) = runCountingFiles(kt.snapshot().where(col("day") === 3))
    assert(n3 == 500 && f3 == 1, s"day=3 after optimize must scan 1 file, scanned $f3")
    val (nR, fR) = runCountingFiles(
      kt.snapshot().where(col("day") >= 4 && col("day") < 5))
    assert(nR == 500 && fR == 1, s"range filter scanned $fR files, expected 1")
    val (nN, fN) = runCountingFiles(kt.snapshot().where(col("day") === 99))
    assert(nN == 0 && fN == 0, s"impossible predicate must scan 0 files, got $fN")
    // unsupported predicate shape: correct, just unpruned
    val (nU, _) = runCountingFiles(kt.snapshot().where(col("day") + 1 === 4))
    assert(nU == 500)
    // snapshot totals unchanged by pruning machinery
    assert(kt.snapshot().count() == 2500)
  }

  test("string and date zone maps prune; delimiter characters survive the log") {
    val t = tmp()
    val schema = Seq((1L, "a", Date.valueOf("2024-01-01")))
      .toDF("id", "cat", "d").schema
    val kt = KeyedTable.create(spark, t, schema, keys = Seq("id"), numBuckets = 1)
    val cats = Seq("alpha|x", "beta;y", "gamma~z", "delta,w") // log-delimiter chars
    val rows = (0L until 400L).map { i =>
      val c = cats((i % 4).toInt)
      (i, c, Date.valueOf(s"2024-0${(i % 4) + 1}-15"))
    }
    kt.upsert(rows.toDF("id", "cat", "d"), uniqueKeys = true)
    withSmallFiles(100) { kt.optimize(Seq("cat")) }
    val total = kt.snapshot().inputFiles.length
    assert(total == 4, s"expected 4 cat-clustered files, got $total")
    val (nc, fc) = runCountingFiles(kt.snapshot().where(col("cat") === "beta;y"))
    assert(nc == 100, s"delimiter-laden string must round-trip, got $nc rows")
    assert(fc == 1, s"string equality scanned $fc of $total files")
    val (nd, fd) = runCountingFiles(
      kt.snapshot().where(col("d") === Date.valueOf("2024-03-15")))
    assert(nd == 100 && fd == 1, s"date equality scanned $fd of $total")
    val (ni, fi) = runCountingFiles(
      kt.snapshot().where(col("cat").isin("alpha|x", "delta,w")))
    assert(ni == 200 && fi == 2, s"IN scanned $fi of $total")
  }

  test("point merge after optimize: untouched buckets carry stats-bearing files") {
    val t = tmp()
    val schema = Seq((1L, 1, 1.0)).toDF("id", "day", "v").schema
    val kt = KeyedTable.create(spark, t, schema, keys = Seq("id"), numBuckets = 4)
    val df = (1L to 2000L).map(i => (i, (i % 4).toInt + 1, i * 1.0))
      .toDF("id", "day", "v")
    kt.upsert(df, uniqueKeys = true)
    // ~125 rows per (bucket, day) run → one file per day per bucket
    withSmallFiles(130) { kt.optimize(Seq("day")) }
    val before = liveEntries(t, kt)
    // a point merge rewrites only ONE bucket (bucket pruning); the other
    // buckets' day-clustered files stay live under their owning commit
    // WITH their stats, so day filters still skip files there
    kt.upsert(Seq((1000L, 4, -1.0)).toDF("id", "day", "v"), uniqueKeys = true)
    val after = liveEntries(t, kt)
    val carried = after.map(_.path).toSet.intersect(before.map(_.path).toSet)
    assert(carried.nonEmpty, "point merge must carry untouched buckets' files")
    assert(after.filter(e => carried(e.path)).forall(_.stats.contains("day")),
      "carried-forward entries lost their zone stats")
    val total = kt.snapshot().inputFiles.length
    val (nD, fD) = runCountingFiles(kt.snapshot().where(col("day") === 2))
    assert(nD == 500, s"day=2 must return 500 rows, got $nD")
    assert(fD < total,
      s"day=2 scanned $fD of $total files — carried stats should still prune")
    // the updated row is found through the pruned read
    val got = kt.snapshot().where(col("v") < 0).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1000L))
  }

  test("deleteWhere rewrites only files the predicate may match, emits delete cdf") {
    val t = tmp()
    val schema = Seq((1L, 1, 1.0)).toDF("id", "day", "v").schema
    val kt = KeyedTable.create(spark, t, schema, keys = Seq("id"), numBuckets = 1)
    val df = (1L to 2000L).map(i => (i, (i % 4).toInt + 1, i * 1.0))
      .toDF("id", "day", "v")
    withSmallFiles(500) { kt.upsert(df, uniqueKeys = true) }
    withSmallFiles(500) { kt.optimize(Seq("day")) }
    val before = liveEntries(t, kt)
    assert(before.size == 4)
    val preV = kt.latestVersion
    val v = kt.deleteWhere(col("day") === 2)
    assert(v == preV + 1)
    val after = liveEntries(t, kt)
    // the day-2 file emptied out entirely; the other three carried by
    // reference — a retention sweep rewrites nothing it keeps
    assert(after.size == 3, s"expected 3 files after purge, got ${after.size}")
    assert(after.map(_.path).toSet.subsetOf(before.map(_.path).toSet),
      "untouched files must carry forward by reference, not be rewritten")
    val m = kt.snapshot().collect()
    assert(m.length == 1500 && !m.exists(_.getInt(1) == 2))
    assert(kt.changesSince(preV).where(col("_change_type") === "delete").count() == 500)
    // no candidate files → version does not advance (no-op)
    assert(kt.deleteWhere(col("day") === 99) == v)
  }

  test("deleteWhere keeps rows where the predicate is null (SQL DELETE semantics)") {
    val t = tmp()
    val df = Seq((1L, Some(1.0)), (2L, None), (3L, Some(-5.0)), (4L, None))
      .toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 1)
    kt.upsert(df, uniqueKeys = true)
    kt.deleteWhere(col("v") < 0)
    val got = kt.snapshot().collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 4L), s"null-predicate rows must survive, got $got")
  }

  test("pruned-column merge carries out-of-range files even when hash ranges overlap") {
    val t = tmp()
    val schema = Seq((1L, 1, 1.0)).toDF("id", "day", "v").schema
    val kt = KeyedTable.create(spark, t, schema, keys = Seq("id"), numBuckets = 1,
      partitionCols = Seq("day"), prunedCols = Seq("day"))
    val df = (1L to 2000L).map(i => (i, (i % 4).toInt + 1, i * 1.0))
      .toDF("id", "day", "v")
    kt.upsert(df, uniqueKeys = true)
    withSmallFiles(500) { kt.optimize(Seq("day")) } // 4 per-day files
    val before = liveEntries(t, kt)
    assert(before.size == 4)
    // after optimize every file's HASH range overlaps the staged batch,
    // so hash pruning alone reads all 4 — the day zone map (no nulls,
    // range excludes day=2's updates) must carry the other 3
    val upd = df.where(col("day") === 2).limit(50)
      .withColumn("v", lit(-1.0))
    kt.upsert(upd, uniqueKeys = true)
    val after = liveEntries(t, kt)
    val carried = after.map(_.path).toSet.intersect(before.map(_.path).toSet)
    assert(carried.size == 3,
      s"prune-carry should keep 3 of 4 files by reference, carried ${carried.size}")
    // contents: exactly the 50 updates applied, nothing else moved
    val m = kt.snapshot().collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m.size == 2000 && m.count(_._2 == -1.0) == 50)
    val expect = df.where(col("day") =!= 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(expect.forall { case (k, v) => m(k) == v },
      "rows of carried days must be unmodified")
  }

  test("non-micros timestamp files record no timestamp stats (never mis-prune)") {
    val t = tmp()
    val df = (1L to 300L).map(i =>
      (i, new java.sql.Timestamp(1700000000000L + i * 1000L))).toDF("id", "ts")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 1)
    // millis-stamped files: the footer's LONG stats are in a different
    // unit than Catalyst micros — recording them would mis-prune 1000×
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try kt.upsert(df, uniqueKeys = true)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    val entries = {
      val lg = new CommitLog(t, spark.sessionState.newHadoopConf())
      lg.readCommit(kt.latestVersion).files.get.values.flatten.toSeq
    }
    assert(entries.forall(!_.stats.contains("ts")),
      s"millis timestamps must record NO stats, got ${entries.map(_.stats)}")
    // correctness unaffected: the filter just runs unpruned
    val cut = new java.sql.Timestamp(1700000000000L + 100 * 1000L)
    val (n, f) = runCountingFiles(kt.snapshot().where(col("ts") <= cut))
    assert(n == 100 && f == kt.snapshot().inputFiles.length)
  }

  test("IS NULL skips files with provably no nulls; null-bearing files are read") {
    val t = tmp()
    val df = (1L to 600L).map(i =>
      (i, if (i <= 300) Some((i % 3).toInt) else None)).toDF("id", "flag")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 1)
    kt.upsert(df, uniqueKeys = true)
    // cluster by flag (nulls sort first): one all-null file, one no-null
    withSmallFiles(300) { kt.optimize(Seq("flag")) }
    val total = kt.snapshot().inputFiles.length
    assert(total >= 2)
    val (n, f) = runCountingFiles(kt.snapshot().where(col("flag").isNull))
    assert(n == 300, s"IS NULL must return the 300 null rows, got $n")
    assert(f < total, s"IS NULL scanned $f of $total files — no-null file should skip")
  }

  test("statless entries are never skipped (conservative fallback)") {
    val t = tmp()
    val schema = Seq((1L, 1)).toDF("id", "day").schema
    val kt = KeyedTable.create(spark, t, schema, keys = Seq("id"), numBuckets = 2)
    spark.conf.set("spark.graft.stats.numIndexedCols", "0") // no zone stats at all
    try kt.upsert((1L to 1000L).map(i => (i, (i % 5).toInt + 1)).toDF("id", "day"),
      uniqueKeys = true)
    finally spark.conf.unset("spark.graft.stats.numIndexedCols")
    val (n, f) = runCountingFiles(kt.snapshot().where(col("day") === 3))
    assert(n == 200, s"statless table must still filter correctly, got $n")
    assert(f == kt.snapshot().inputFiles.length,
      "files without stats must never be skipped")
  }
}
