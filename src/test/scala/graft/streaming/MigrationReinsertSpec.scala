package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.store.KeyedTable

import java.nio.file.Files

/** Join-key migration via DELETE + RE-INSERT inside one drain window.
  * A key deleted and re-inserted with a CHANGED join-condition column
  * produces NO update_preimage rows, so preimage-only moved-detection
  * misses it and neither the owning-side fused retraction nor the
  * non-owning downgrade resolves the pre-delete pairing — the stale
  * row survives and incremental != batch (the r9 advice hole). The
  * delete change row carries exactly the window-start image, so it now
  * feeds moved-detection like a preimage.
  */
class MigrationReinsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("gmr").toString

  private def assertSameRows(got: DataFrame, want: DataFrame, ctx: String): Unit = {
    val cols = want.columns.sorted.toSeq
    val g = got.select(cols.map(col): _*)
    val w = want.select(cols.map(col): _*)
    val onlyGot = g.exceptAll(w).count()
    val onlyWant = w.exceptAll(g).count()
    assert(onlyGot == 0 && onlyWant == 0,
      s"$ctx: $onlyGot rows only incremental, $onlyWant only in batch recompute")
  }

  private def mkTables(root: String): (KeyedTable, KeyedTable) = {
    val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
    val rSchema = Seq((1L, 1L, "x", 0L)).toDF("rid", "rkey", "name", "rseq").schema
    (KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
      seqCols = Seq("seq"), numBuckets = 4),
      KeyedTable.create(spark, s"$root/r", rSchema, Seq("rid"),
        seqCols = Seq("rseq"), numBuckets = 4))
  }

  test("INNER join: owning-side delete+re-insert with a moved key retracts the old pairing") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT).handleDeletes()
      .join(Stream.fromKeyedTable(rT), "inner")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L)).toDF("id", "lkey", "cents", "seq"),
      uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L), (6L, 20L, "b", 1L))
      .toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
    pipe.runIncremental()
    val out = KeyedTable.forPath(spark, s"$root/out")
    assert(out.snapshot().where(col("id") === 1 && col("rid") === 5).count() == 1)
    // SAME window: delete id=1, then re-insert it with lkey 10 -> 20
    lT.delete(Seq(1L).toDF("id"))
    lT.upsert(Seq((1L, 20L, 150L, 2L)).toDF("id", "lkey", "cents", "seq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val snap = out.snapshot()
    assert(snap.where(col("id") === 1 && col("rid") === 5).count() == 0,
      "the pre-delete pairing must retract")
    assert(snap.where(col("id") === 1 && col("rid") === 6).count() == 1,
      "the re-inserted key must pair under its new join column")
    val want = lT.snapshot().join(rT.snapshot(),
        col("lkey") === col("rkey"), "inner")
      .select(snap.columns.map(col).toSeq: _*)
    assertSameRows(snap, want, "inner delete+reinsert move")
  }

  test("LEFT join: owning-side delete+re-insert move retracts via the fused merge path") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT).handleDeletes()
      .join(Stream.fromKeyedTable(rT), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L)).toDF("id", "lkey", "cents", "seq"),
      uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L), (6L, 20L, "b", 1L))
      .toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
    pipe.runIncremental()
    lT.delete(Seq(1L).toDF("id"))
    lT.upsert(Seq((1L, 20L, 150L, 2L)).toDF("id", "lkey", "cents", "seq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assert(snap.where(col("id") === 1 && col("rid") === 5).count() == 0,
      "the pre-delete pairing must retract")
    assert(snap.where(col("id") === 1 && col("rid") === 6).count() == 1)
    val want = lT.snapshot().join(rT.snapshot(),
        col("lkey") === col("rkey"), "left")
      .select(snap.columns.map(col).toSeq: _*)
    assertSameRows(snap, want, "left owning delete+reinsert move")
  }

  test("LEFT join: NON-owning delete+re-insert move goes through the downgrade pass") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT)
      .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L), (2L, 20L, 200L, 1L))
      .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    // SAME window: delete rid=5 and re-insert it with rkey 10 -> 20:
    // id=1 must downgrade to a placeholder, id=2 gains the pairing
    rT.delete(Seq(5L).toDF("rid"))
    rT.upsert(Seq((5L, 20L, "a2", 2L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assert(snap.where(col("id") === 1 && col("rid").isNull).count() == 1,
      "id=1 must downgrade to a placeholder after its match's delete+reinsert move")
    assert(snap.where(col("id") === 1 && col("rid") === 5).count() == 0,
      "the pre-delete pairing must not survive")
    assert(snap.where(col("id") === 2 && col("rid") === 5).count() == 1,
      "id=2 must gain the re-inserted pairing")
    val want = lT.snapshot().join(rT.snapshot(),
        col("lkey") === col("rkey"), "left")
      .select(snap.columns.map(col).toSeq: _*)
    assertSameRows(snap, want, "non-owning delete+reinsert move")
  }

  test("a projection dropping a movable side's pks REFUSES at build (no silent staleness)") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    // right side joins on rkey (movable: not its pk) and the projection
    // drops rid — a right-side key move could never retract its old
    // pairing. Build must refuse with an actionable message.
    val e = intercept[IllegalArgumentException] {
      Stream.fromKeyedTable(lT)
        .join(Stream.fromKeyedTable(rT), "left")
        .on((l, r) => l("lkey") === r("rkey"))
        .select("id", "lkey", "cents", "name")
        .writeToPath(s"$root/out")
    }
    assert(e.getMessage.contains("migrationCheck"),
      s"refusal must point at the opt-out conf: ${e.getMessage}")
    // the documented opt-out builds fine
    spark.conf.set("spark.graft.join.migrationCheck", "false")
    try {
      Stream.fromKeyedTable(lT)
        .join(Stream.fromKeyedTable(rT), "left")
        .on((l, r) => l("lkey") === r("rkey"))
        .select("id", "lkey", "cents", "name")
        .writeToPath(s"$root/out2")
    } finally spark.conf.unset("spark.graft.join.migrationCheck")
  }

  test("delete+re-insert with an UNCHANGED join column stays a plain upsert") {
    val root = tmp()
    val (lT, rT) = mkTables(root)
    val pipe = Stream.fromKeyedTable(lT).handleDeletes()
      .join(Stream.fromKeyedTable(rT), "inner")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L)).toDF("id", "lkey", "cents", "seq"),
      uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    lT.delete(Seq(1L).toDF("id"))
    lT.upsert(Seq((1L, 10L, 999L, 2L)).toDF("id", "lkey", "cents", "seq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assert(snap.where(col("id") === 1 && col("rid") === 5 &&
      col("cents") === 999).count() == 1)
    val want = lT.snapshot().join(rT.snapshot(),
        col("lkey") === col("rkey"), "inner")
      .select(snap.columns.map(col).toSeq: _*)
    assertSameRows(snap, want, "unchanged-key delete+reinsert")
  }
}
