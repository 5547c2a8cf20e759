package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.store.KeyedTable

import java.nio.file.Files

/** Emptied-group removal WITHOUT a user count column: the agg stage
  * maintains a hidden `__graft_rows` internal column on its output
  * table — stripped from every public read — so a group whose rows all
  * leave is deleted exactly, matching the batch fixpoint. (Previously a
  * documented limitation: sum-only aggs kept zeroed shell rows.)
  */
class HiddenCountSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("ghc").toString

  private def assertSameRows(got: DataFrame, want: DataFrame, ctx: String): Unit = {
    val cols = want.columns.sorted.toSeq
    val g = got.select(cols.map(col): _*)
    val w = want.select(cols.map(col): _*)
    assert(g.exceptAll(w).count() == 0 && w.exceptAll(g).count() == 0, ctx)
  }

  test("sum-only agg drops emptied groups and hides the internal column") {
    val root = tmp()
    val schema = Seq((1L, "a", 1L, 0L)).toDF("id", "grp", "cents", "seq").schema
    val t = KeyedTable.create(spark, s"$root/src", schema, Seq("id"),
      seqCols = Seq("seq"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(t).handleDeletes()
      .groupBy("grp")
      .agg(sum(col("cents")).as("scents")) // NO count column
      .writeToPath(s"$root/agg")
    t.upsert(Seq((1L, "a", 100L, 1L), (2L, "a", 50L, 1L), (3L, "b", 70L, 1L))
      .toDF("id", "grp", "cents", "seq"), uniqueKeys = true)
    pipe.runIncremental()
    val out = KeyedTable.forPath(spark, s"$root/agg")
    assert(!out.snapshot().columns.contains("__graft_rows"),
      "the hidden count must not appear in public reads")
    // empty group "a" via delete + move
    t.delete(Seq(1L).toDF("id"))
    t.upsert(Seq((2L, "b", 50L, 2L)).toDF("id", "grp", "cents", "seq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val snap = out.snapshot()
    assert(snap.where(col("grp") === "a").count() == 0,
      "emptied group must be deleted, not kept as a zeroed shell")
    val want = t.snapshot().groupBy("grp").agg(sum(col("cents")).as("scents"))
    assertSameRows(snap, want, "sum-only agg fixpoint")
    // the feed downstream must not leak the internal column either
    assert(!out.changesSince(-1L).columns.contains("__graft_rows"),
      "the hidden count must not appear in the change feed")
  }

  test("hidden count survives a REBUCKET of the agg output") {
    val root = tmp()
    val schema = Seq((1L, "a", 1L, 0L)).toDF("id", "grp", "cents", "seq").schema
    val t = KeyedTable.create(spark, s"$root/src", schema, Seq("id"),
      seqCols = Seq("seq"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(t).handleDeletes()
      .groupBy("grp")
      .agg(sum(col("cents")).as("scents"))
      .writeToPath(s"$root/agg")
    t.upsert(Seq((1L, "a", 100L, 1L), (2L, "b", 50L, 1L))
      .toDF("id", "grp", "cents", "seq"), uniqueKeys = true)
    pipe.runIncremental()
    val out = KeyedTable.forPath(spark, s"$root/agg")
    out.rebucket(8) // layout rewrite must carry the internal column
    t.delete(Seq(1L).toDF("id"))
    pipe.runIncremental()
    val snap = KeyedTable.forPath(spark, s"$root/agg").snapshot()
    assert(snap.where(col("grp") === "a").count() == 0,
      "zero detection must keep working after a rebucket")
    assertSameRows(snap,
      t.snapshot().groupBy("grp").agg(sum(col("cents")).as("scents")),
      "post-rebucket fixpoint")
  }

  test("a user count(*) column is preferred — no hidden column is added") {
    val root = tmp()
    val schema = Seq((1L, "a", 1L, 0L)).toDF("id", "grp", "cents", "seq").schema
    val t = KeyedTable.create(spark, s"$root/src", schema, Seq("id"),
      seqCols = Seq("seq"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(t).handleDeletes()
      .groupBy("grp")
      .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
      .writeToPath(s"$root/agg")
    t.upsert(Seq((1L, "a", 100L, 1L)).toDF("id", "grp", "cents", "seq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val out = KeyedTable.forPath(spark, s"$root/agg")
    assert(out.meta.internalCols.isEmpty,
      "no hidden column when the user already declared a plain count")
    t.delete(Seq(1L).toDF("id"))
    pipe.runIncremental()
    assert(KeyedTable.forPath(spark, s"$root/agg").snapshot()
      .where(col("grp") === "a").count() == 0)
  }

  test("a group created AND fully deleted inside ONE window leaves no shell row") {
    // insert of a brand-new group key then its delete, both pending in
    // the same drain window: plus/minus cancel to an all-zero delta and
    // the group is absent from the table — an inner-joined zero check
    // never withholds it, so the zero row used to merge as a shell row
    // the batch fixpoint has no row for (the r9 advice hole)
    val root = tmp()
    val schema = Seq((1L, "a", 1L, 0L)).toDF("id", "grp", "cents", "seq").schema
    val t = KeyedTable.create(spark, s"$root/src", schema, Seq("id"),
      seqCols = Seq("seq"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(t).handleDeletes()
      .groupBy("grp")
      .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
      .writeToPath(s"$root/agg")
    t.upsert(Seq((1L, "a", 100L, 1L)).toDF("id", "grp", "cents", "seq"),
      uniqueKeys = true)
    pipe.runIncremental()
    // SAME window: create group "z" then delete its only row
    t.upsert(Seq((9L, "z", 10L, 1L)).toDF("id", "grp", "cents", "seq"),
      uniqueKeys = true)
    t.delete(Seq(9L).toDF("id"))
    pipe.runIncremental()
    val snap = KeyedTable.forPath(spark, s"$root/agg").snapshot()
    assert(snap.where(col("grp") === "z").count() == 0,
      "a created-and-retracted group must not leave a zero-count shell row")
    val want = t.snapshot().groupBy("grp")
      .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
    assertSameRows(snap, want, "created-and-deleted group fixpoint")
  }

  test("a group created then MOVED AWAY inside ONE window leaves no shell row (no deletes)") {
    // same hole via a group move, with NO handleDeletes anywhere: a new
    // row lands in group "z" and an update moves it to "a" in the same
    // window — group "z" cancels to zero and is absent from the table
    val root = tmp()
    val schema = Seq((1L, "a", 1L, 0L)).toDF("id", "grp", "cents", "seq").schema
    val t = KeyedTable.create(spark, s"$root/src", schema, Seq("id"),
      seqCols = Seq("seq"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(t)
      .groupBy("grp")
      .agg(sum(col("cents")).as("scents")) // sum-only: hidden count path
      .writeToPath(s"$root/agg")
    t.upsert(Seq((1L, "a", 100L, 1L)).toDF("id", "grp", "cents", "seq"),
      uniqueKeys = true)
    pipe.runIncremental()
    t.upsert(Seq((9L, "z", 10L, 1L)).toDF("id", "grp", "cents", "seq"),
      uniqueKeys = true)
    t.upsert(Seq((9L, "a", 10L, 2L)).toDF("id", "grp", "cents", "seq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val snap = KeyedTable.forPath(spark, s"$root/agg").snapshot()
    assert(snap.where(col("grp") === "z").count() == 0,
      "a created-and-moved-away group must not leave a shell row")
    val want = t.snapshot().groupBy("grp").agg(sum(col("cents")).as("scents"))
    assertSameRows(snap, want, "created-and-moved group fixpoint")
  }

  test("a NULL group key survives net-zero churn (placeholder member swap)") {
    // Placeholder rows of a left join carry NULL group keys into a
    // downstream agg. The zero-group check probes current counts with a
    // point read; before the null-safe probe fix that read silently
    // missed the null group (USING-join equality), misread its count as
    // 0, and a member SWAP (one placeholder upgraded, one new
    // placeholder in the same window — net count delta 0) classified
    // the live group as emptied and deleted it (seed-67 regression).
    val root = tmp()
    val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
    val rSchema = Seq((1L, "x", 0L)).toDF("rkey", "name", "rseq").schema
    val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
      seqCols = Seq("seq"), numBuckets = 4)
    val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rkey"),
      seqCols = Seq("rseq"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(lT).handleDeletes()
      .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .groupByStaged(s"$root/stage", "name")
      .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
      .writeToPath(s"$root/agg")
    // id=1 matches rkey=10; ids 2,3 are placeholders (null group, n=2)
    lT.upsert(Seq((1L, 10L, 100L, 1L), (2L, 20L, 40L, 1L), (3L, 21L, 60L, 1L))
      .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
    rT.upsert(Seq((10L, "a", 1L)).toDF("rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    def agged = KeyedTable.forPath(spark, s"$root/agg").snapshot()
    assert(agged.where(col("name").isNull && col("n") === 2).count() == 1)
    // ONE window: id=2 upgrades (rkey=20 appears) AND id=1 downgrades
    // (its match moves away) — null group stays n=2 with swapped members
    rT.upsert(Seq((20L, "b", 2L)).toDF("rkey", "name", "rseq"),
      uniqueKeys = true)
    rT.delete(Seq(10L).toDF("rkey"))
    pipe.runIncremental()
    val snap = agged
    assert(snap.where(col("name").isNull).count() == 1,
      "the live null group must survive net-zero churn")
    assert(snap.where(col("name").isNull && col("n") === 2 &&
      col("scents") === 160L).count() == 1,
      "null group must carry the swapped members' sums (ids 1,3)")
    val want = lT.snapshot().join(rT.snapshot(),
        col("lkey") === col("rkey"), "left")
      .groupBy("name")
      .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
    assertSameRows(snap, want, "null-group fixpoint")
  }
}
