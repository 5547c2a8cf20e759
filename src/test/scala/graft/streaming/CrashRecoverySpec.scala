package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.store.KeyedTable

import java.nio.file.{Files, Paths, StandardCopyOption}

/** A drain step that crashes AFTER its merge commit but BEFORE its
  * state commit leaves an intent file whose merge landed. Promotion
  * alone would skip the step's POST-merge passes (delete propagation,
  * the non-owning downgrade, the emptied-group check) forever —
  * `loadRecovering` must replay the full step body instead (the merge
  * is a batchId no-op; the passes are idempotent).
  *
  * The crash is simulated exactly: run the step with the pass DISABLED
  * via its conf knob (so the merge lands but the pass never ran), then
  * restore the drain dir to the crashed shape (state = pre-step, intent
  * = the step) and re-drain with the pass enabled.
  */
class CrashRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("gcr").toString

  private def copy(from: String, to: String): Unit = {
    Files.copy(Paths.get(from), Paths.get(to), StandardCopyOption.REPLACE_EXISTING)
    // drop Hadoop local-FS checksum sidecars invalidated by the raw copy
    val p = Paths.get(to)
    Files.deleteIfExists(p.getParent.resolve(s".${p.getFileName}.crc"))
  }

  test("agg step recovery replays the emptied-group check") {
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
    val drain = s"$root/agg/_drain"
    copy(s"$drain/state.properties", s"$root/base.properties")
    // the step whose zero check "crashed away": delete empties group "a"
    t.delete(Seq(1L).toDF("id"))
    spark.conf.set("spark.graft.agg.zeroGroupCheck", "false")
    try pipe.runIncremental()
    finally spark.conf.unset("spark.graft.agg.zeroGroupCheck")
    val out = KeyedTable.forPath(spark, s"$root/agg")
    assert(out.snapshot().where(col("grp") === "a").count() == 1,
      "precondition: the zeroed shell survived the check-less drain")
    // craft the crash shape: intent = the landed step, state = pre-step
    copy(s"$drain/state.properties", s"$drain/intent.properties")
    copy(s"$root/base.properties", s"$drain/state.properties")
    pipe.runIncremental() // recovery must replay the step body
    val snap = KeyedTable.forPath(spark, s"$root/agg").snapshot()
    assert(snap.where(col("grp") === "a").count() == 0,
      "recovery must run the emptied-group check the crash skipped")
    assert(snap.where(col("grp") === "b").count() == 1)
  }

  test("join step recovery replays the non-owning downgrade") {
    val root = tmp()
    val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
    val rSchema = Seq((1L, 1L, "x", 0L)).toDF("rid", "rkey", "name", "rseq").schema
    val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
      seqCols = Seq("seq"), numBuckets = 4)
    val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rid"),
      seqCols = Seq("rseq"), numBuckets = 4)
    val pipe = Stream.fromKeyedTable(lT)
      .join(Stream.fromKeyedTable(rT), "left")
      .on((l, r) => l("lkey") === r("rkey"))
      .writeToPath(s"$root/out")
    lT.upsert(Seq((1L, 10L, 100L, 1L)).toDF("id", "lkey", "cents", "seq"),
      uniqueKeys = true)
    rT.upsert(Seq((5L, 10L, "a", 1L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    pipe.runIncremental()
    val drain = s"$root/out/_drain"
    copy(s"$drain/state.properties", s"$root/base.properties")
    // right side moves out of range; with the migration check off the
    // merge lands but the downgrade never runs — the old pairing strands
    rT.upsert(Seq((5L, 99L, "a2", 2L)).toDF("rid", "rkey", "name", "rseq"),
      uniqueKeys = true)
    spark.conf.set("spark.graft.join.migrationCheck", "false")
    try pipe.runIncremental()
    finally spark.conf.unset("spark.graft.join.migrationCheck")
    val out = KeyedTable.forPath(spark, s"$root/out")
    assert(out.snapshot().where(col("id") === 1 && col("rid") === 5).count() == 1,
      "precondition: the stale pairing survived the check-less drain")
    copy(s"$drain/state.properties", s"$drain/intent.properties")
    copy(s"$root/base.properties", s"$drain/state.properties")
    // this step's merge committed NOTHING (the moved-away row joins no
    // batch half), so the intent does not count as landed — recovery
    // goes through the dead-drainer ADOPT path after the claim grace
    spark.conf.set("spark.graft.drain.claimGraceMs", "300")
    try pipe.runIncremental() // recovery must replay the step body
    finally spark.conf.unset("spark.graft.drain.claimGraceMs")
    val snap = KeyedTable.forPath(spark, s"$root/out").snapshot()
    assert(snap.where(col("id") === 1 && col("rid").isNull).count() == 1,
      "recovery must downgrade the stranded pairing to a placeholder")
    assert(snap.where(col("rid") === 5).count() == 0)
  }
}
