package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.store.KeyedTable

import java.nio.file.Files

/** Non-owning-side retraction on OUTER joins: deletes and join-key
  * moves on the side that does NOT own output rows must DOWNGRADE the
  * old pairings — left rows survive as placeholder rows when their last
  * match goes away, keep their other matches otherwise — so the
  * incremental output equals the batch recompute. (The reference
  * strands the old pairing: it never retracts, joins.py:310-343.)
  */
class OuterRetractionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("gor").toString

  private def assertSameRows(got: DataFrame, want: DataFrame, ctx: String): Unit = {
    val cols = want.columns.sorted.toSeq
    val g = got.select(cols.map(col): _*)
    val w = want.select(cols.map(col): _*)
    val onlyGot = g.exceptAll(w).count()
    val onlyWant = w.exceptAll(g).count()
    assert(onlyGot == 0 && onlyWant == 0,
      s"$ctx: $onlyGot rows only incremental, $onlyWant only in batch recompute")
  }

  // left: pk id, join col lkey; right: pk rid, join col rkey (NOT the
  // pk — so right-side moves are possible)
  private def mkTables(root: String): (KeyedTable, KeyedTable) = {
    val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
    val rSchema = Seq((1L, 1L, "x", 0L)).toDF("rid", "rkey", "name", "rseq").schema
    (KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
      seqCols = Seq("seq"), numBuckets = 4),
      KeyedTable.create(spark, s"$root/r", rSchema, Seq("rid"),
        seqCols = Seq("rseq"), numBuckets = 4))
  }

  private def batchWant(lT: KeyedTable, rT: KeyedTable, out: DataFrame): DataFrame =
    lT.snapshot().join(rT.snapshot(), col("lkey") === col("rkey"), "left")
      .select(out.columns.map(col).toSeq: _*)

  test("right-side DELETE downgrades the left row to a placeholder") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT)
      .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L), (2L, 11L, 200L, 1L))
      .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val out = KeyedTable.forPath(spark, s"$root/out")
    // id=1 paired with rid=5; id=2 is a placeholder
    assert(out.snapshot().where(col("id") === 1 && col("rid") === 5).count() == 1)
    assert(out.snapshot().where(col("id") === 2 && col("rid").isNull).count() == 1)
    rT.delete(Seq(5L).toDF("rid"))
    pipe.runIncremental()
    val snap = out.snapshot()
    assert(snap.where(col("id") === 1 && col("rid").isNull).count() == 1,
      "id=1 must downgrade to a placeholder after its only match is deleted")
    assert(snap.where(col("rid") === 5).count() == 0, "no stale pairing survives")
    assertSameRows(snap, batchWant(lT, rT, snap), "delete downgrade")
  }

  test("right-side KEY MOVE re-pairs and downgrades old pairings") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT)
      .join(Stream.fromKeyedTable(rT), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L), (2L, 20L, 200L, 1L))
      .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    // move rid=5 from rkey 10 -> 20: id=1 loses its match (placeholder),
    // id=2 gains one
    rT.upsert(Seq((5L, 20L, "a2", 2L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assert(snap.where(col("id") === 1 && col("rid").isNull).count() == 1,
      "id=1 must downgrade to a placeholder after its match moved away")
    assert(snap.where(col("id") === 2 && col("rid") === 5).count() == 1,
      "id=2 must gain the moved pairing")
    assert(snap.where(col("id") === 1 && col("rid") === 5).count() == 0,
      "the old pairing must not survive")
    assertSameRows(snap, batchWant(lT, rT, snap), "move downgrade")
  }

  test("multi-match: losing ONE match keeps the others, no placeholder") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT)
      .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L)).toDF("id", "lkey", "cents", "seq"),
      uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L), (6L, 10L, "b", 1L))
      .toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
    pipe.runIncremental()
    rT.delete(Seq(5L).toDF("rid"))
    pipe.runIncremental()
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assert(snap.where(col("id") === 1 && col("rid") === 6).count() == 1,
      "the surviving match stays")
    assert(snap.where(col("id") === 1 && col("rid").isNull).count() == 0,
      "no placeholder while a real match remains")
    assertSameRows(snap, batchWant(lT, rT, snap), "multi-match")
  }

  test("placeholder upgrades when a NEW right row moves into range, then downgrades back") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT)
      .join(Stream.fromKeyedTable(rT), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L)).toDF("id", "lkey", "cents", "seq"),
      uniqueKeys = true)
    rT.upsert(Seq((5L, 99L, "a", 1L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental() // id=1 is a placeholder
    rT.upsert(Seq((5L, 10L, "a2", 2L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental() // moved INTO range: placeholder upgrades
    val mid = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assert(mid.where(col("id") === 1 && col("rid") === 5).count() == 1)
    assert(mid.where(col("id") === 1 && col("rid").isNull).count() == 0)
    rT.upsert(Seq((5L, 99L, "a3", 3L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental() // moved back out: downgrade again
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assert(snap.where(col("id") === 1 && col("rid").isNull).count() == 1)
    assert(snap.where(col("id") === 1 && col("rid") === 5).count() == 0)
    assertSameRows(snap, batchWant(lT, rT, snap), "upgrade/downgrade cycle")
  }

  test("RIGHT join: left-side delete downgrades symmetrically") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT).handleDeletes()
      .join(Stream.fromKeyedTable(rT), "right")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L)).toDF("id", "lkey", "cents", "seq"),
      uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L), (6L, 30L, "b", 1L))
      .toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
    pipe.runIncremental()
    lT.delete(Seq(1L).toDF("id"))
    pipe.runIncremental()
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    val want = lT.snapshot().join(rT.snapshot(),
        col("lkey") === col("rkey"), "right")
      .select(snap.columns.map(col).toSeq: _*)
    assert(snap.where(col("rid") === 5 && col("id").isNull).count() == 1,
      "rid=5 must downgrade to a placeholder")
    assertSameRows(snap, want, "right join downgrade")
  }

  test("downgrade stays correct with static pruning forced on") {
    // drop the prune threshold to 1 byte so the downgrade's owning-side
    // and re-derive static reads take the bucket-pruned point-read path
    val root = tmp()
    val (lT, rT) = mkTables(root)
    spark.conf.set("spark.graft.join.staticPrune.minBytes", "1")
    try {
      val pipe = Stream.fromKeyedTable(lT)
        .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
        .on((l, r) => l("lkey") === r("rkey"))
        .writeToPath(s"$root/out")
      lT.upsert(Seq((1L, 10L, 100L, 1L), (2L, 20L, 200L, 1L), (3L, 10L, 50L, 1L))
        .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
      rT.upsert(Seq((5L, 10L, "a", 1L), (6L, 20L, "b", 1L))
        .toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
      pipe.runIncremental()
      rT.upsert(Seq((5L, 20L, "a2", 2L)).toDF("rid", "rkey", "name", "rseq"),
        uniqueKeys = true) // move
      rT.delete(Seq(6L).toDF("rid"))                            // delete
      pipe.runIncremental()
      val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
      assertSameRows(snap, batchWant(lT, rT, snap), "pruned downgrade")
    } finally spark.conf.unset("spark.graft.join.staticPrune.minBytes")
  }

  test("UNION right side: downgrade falls back to the unioned static") {
    val root = tmp()
    val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
    val rSchema = Seq((1L, 1L, "x", 0L)).toDF("rid", "rkey", "name", "rseq").schema
    val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
      seqCols = Seq("seq"), numBuckets = 4)
    val rT1 = KeyedTable.create(spark, s"$root/r1", rSchema, Seq("rid"),
      seqCols = Seq("rseq"), numBuckets = 4)
    val rT2 = KeyedTable.create(spark, s"$root/r2", rSchema, Seq("rid"),
      seqCols = Seq("rseq"), numBuckets = 4)
    // disjoint rid spaces across union members
    val pipe = Stream.fromKeyedTable(lT)
      .join(Stream.fromKeyedTable(rT1).handleDeletes()
        .union(Stream.fromKeyedTable(rT2).handleDeletes()), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L), (2L, 20L, 200L, 1L))
      .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
    rT1.upsert(Seq((5L, 10L, "a", 1L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    rT2.upsert(Seq((105L, 20L, "b", 1L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    // delete from member 1, move within member 2
    rT1.delete(Seq(5L).toDF("rid"))
    rT2.upsert(Seq((105L, 10L, "b2", 2L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    val want = lT.snapshot().join(
        rT1.snapshot().unionByName(rT2.snapshot()),
        col("lkey") === col("rkey"), "left")
      .select(snap.columns.map(col).toSeq: _*)
    assert(snap.where(col("id") === 1 && col("rid") === 105).count() == 1,
      "id=1 must re-pair with the moved union-member row")
    assert(snap.where(col("id") === 2 && col("rid").isNull).count() == 1,
      "id=2 must downgrade after its member-2 match moved away")
    assertSameRows(snap, want, "union non-owning downgrade")
  }

  test("downgrade past the broadcast threshold falls back to a shuffle join and stays correct") {
    // broadcastMaxRows=0 forces the affected-owning-rows re-derive onto
    // the plain shuffle-join path — one retracted hot key joined by a
    // low-cardinality column fans out to MANY owning rows, the shape an
    // unconditional broadcast OOMs on at scale
    val root = tmp()
    val (lT, rT) = mkTables(root)
    spark.conf.set("spark.graft.join.downgrade.broadcastMaxRows", "0")
    try {
      val pipe = Stream.fromKeyedTable(lT)
        .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
        .on((l, r) => l("lkey") === r("rkey"))
        .writeToPath(s"$root/out")
      // 50 left rows all share lkey=10 — one right delete affects all
      lT.upsert((1L to 50L).map(i => (i, 10L, i * 10L, 1L))
        .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
      rT.upsert(Seq((5L, 10L, "a", 1L), (6L, 10L, "b", 1L))
        .toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
      pipe.runIncremental()
      DowngradeDebug.record(-1L, bcast = true) // reset the hook
      rT.delete(Seq(5L).toDF("rid"))
      pipe.runIncremental()
      assert(DowngradeDebug.lastAffRows == 50L,
        s"hot-key fan-out must reach all owning rows (got ${DowngradeDebug.lastAffRows})")
      assert(!DowngradeDebug.lastUsedBroadcast,
        "past the threshold the re-derive must take the shuffle-join path")
      val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
      assert(snap.where(col("rid") === 5).count() == 0)
      assert(snap.where(col("rid") === 6).count() == 50)
      assertSameRows(snap, batchWant(lT, rT, snap), "shuffle-fallback downgrade")
    } finally spark.conf.unset("spark.graft.join.downgrade.broadcastMaxRows")
  }

  test("downgrade below the broadcast threshold keeps the broadcast plan") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT)
      .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L)).toDF("id", "lkey", "cents", "seq"),
      uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    DowngradeDebug.record(-1L, bcast = false)
    rT.delete(Seq(5L).toDF("rid"))
    pipe.runIncremental()
    assert(DowngradeDebug.lastAffRows == 1L)
    assert(DowngradeDebug.lastUsedBroadcast,
      "a microbatch-sized affected set must broadcast")
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assertSameRows(snap, batchWant(lT, rT, snap), "broadcast downgrade")
  }

  test("CHAINED: outer-stage downgrade deletes retract in the next stage without user handleDeletes") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    // stage 1: left join (no user deletes on the left source); stage 2:
    // groupBy over a right-side attribute. A right-side key move in
    // stage 1 emits downgrade deletes that stage 2 must apply even
    // though the user never called handleDeletes anywhere upstream.
    val pipe = Stream.fromKeyedTable(lT)
      .join(Stream.fromKeyedTable(rT), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .groupByStaged(s"$root/stage", "name")
      .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
      .writeToPath(s"$root/agged")
    lT.upsert(Seq((1L, 10L, 100L, 1L), (2L, 20L, 200L, 1L))
      .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L), (6L, 20L, "b", 1L))
      .toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
    pipe.runIncremental()
    // move rid=5 out of range: stage 1 downgrades (1,5)->(1,null);
    // stage 2's group "a" must retract id=1's contribution
    rT.upsert(Seq((5L, 99L, "a", 2L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val got = KeyedTable.forPath(spark, s"$root/agged").snapshot()
    val want = lT.snapshot().join(rT.snapshot(),
        col("lkey") === col("rkey"), "left")
      .groupBy("name")
      .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
      .select(got.columns.map(col).toSeq: _*)
    assertSameRows(got, want, "chained downgrade retraction")
  }

  test("downgrade pass job count stays at its pinned floor") {
    // The pass's per-commit fixed job count is the last lever on the
    // downgrade gates' bench cost. This pins the measured job count of
    // a delete-downgrade commit so a new fixed per-commit job creeps
    // in loudly, not silently.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT)
      .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L), (2L, 11L, 200L, 1L))
      .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L), (6L, 11L, "b", 1L))
      .toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
    pipe.runIncremental()
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = js.properties.getProperty("spark.job.description")
        if (d != null && d.startsWith("graft:join:downgrade")) counter.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      rT.delete(Seq(5L).toDF("rid"))
      pipe.runIncremental()
      // listener events are async: wait until the count is stable
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        val c = counter.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
        Thread.sleep(100)
      }
      val jobs = counter.get()
      assert(jobs > 0, "the delete must route through the downgrade pass")
      assert(jobs <= DOWNGRADE_JOB_FLOOR,
        s"downgrade pass ran $jobs jobs > pinned floor $DOWNGRADE_JOB_FLOOR")
    } finally spark.sparkContext.removeSparkListener(listener)
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assertSameRows(snap, batchWant(lT, rT, snap), "non-empty downgrade")
  }

  test("empty moved-set downgrade window exits on the cheap guard") {
    // downgrade() runs on ANY window with non-owning preimages, but a
    // routine update that moves no condition column resolves to an
    // empty key set. The pass must exit on one cheap count of the
    // persisted keys — BEFORE building the affected-row derivation,
    // whose prunedStatic path runs driver-side probe collects even
    // when the plan is never executed. Two pins: (a) DowngradeDebug
    // (recorded only after the derivation's aff count) must stay at
    // its sentinel, proving the derivation never ran; (b) the job
    // count stays well under the non-empty floor — AQE materializes
    // one job per query stage, so sk's own derivation accounts for
    // ~6; the derivation + fused-commit merge would push it to ~16.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT)
      .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L), (2L, 11L, 200L, 1L))
      .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L), (6L, 11L, "b", 1L))
      .toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
    pipe.runIncremental()
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = js.properties.getProperty("spark.job.description")
        if (d != null && d.startsWith("graft:join:downgrade")) counter.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    DowngradeDebug.record(-7L, bcast = false) // sentinel
    try {
      // non-condition-column update: preimage present (pass entered),
      // but rkey unchanged so the moved-key set is empty
      rT.upsert(Seq((5L, 10L, "a2", 2L)).toDF("rid", "rkey", "name", "rseq"),
        uniqueKeys = true)
      pipe.runIncremental()
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        val c = counter.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
        Thread.sleep(100)
      }
      val jobs = counter.get()
      assert(jobs > 0, "the preimage window must enter the downgrade pass")
      assert(DowngradeDebug.lastAffRows == -7L,
        "the affected-row derivation ran on an empty moved-key window — " +
          "the cheap guard must exit first")
      assert(jobs <= 8,
        s"empty moved-set downgrade ran $jobs jobs — the cheap guard " +
          "must exit before the affected-row derivation and merge")
    } finally spark.sparkContext.removeSparkListener(listener)
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assertSameRows(snap, batchWant(lT, rT, snap), "empty-sk window")
  }
  // measured floor on the delete scenario above — includes the merge's
  // own write/stats jobs, which run inside the pass's job description
  // scope. History: 16 with two separate sk/aff counts, 14 with the
  // fused tagged-union count, back to 16 now that the sk-emptiness
  // guard runs as its own count ahead of the plain aff count: rare
  // retraction windows pay ~2 extra trivial scheduler jobs over tiny
  // cached data so that ROUTINE empty-moved-set windows (the common
  // case) skip the entire derivation — see the empty-window test.
  private val DOWNGRADE_JOB_FLOOR = 16
}
