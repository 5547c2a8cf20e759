package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import java.nio.file.Files

/** Round-6 concurrency hardening: rebucket-epoch detection (a merge
  * planned under the old bucket modulus must replay after a racing
  * rebucket commits, SURVEY §6h-3) and version-pruned cdf listing. */
class EpochDrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("epoch").toString

  test("merge racing a rebucket detects the epoch change and replays") {
    val t = tmp()
    val df = (1L to 400L).map(i => (i, 0.0)).toDF("id", "v")
    val h1 = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    h1.upsert(df, uniqueKeys = true)
    val h2 = KeyedTable.forPath(spark, t)
    // h2 stages a merge under modulus 4; the hook fires after h2's files
    // are written, right before its claim — h1 rebuckets to 16 there
    var fired = false
    h2.preCommitHook = () => if (!fired) { fired = true; h1.rebucket(16) }
    h2.upsert(Seq((7L, 7.7)).toDF("id", "v"), uniqueKeys = true)
    h2.preCommitHook = () => ()
    assert(h2.meta.numBuckets == 16, "loser did not pick up the new modulus")
    val fresh = KeyedTable.forPath(spark, t)
    assert(fresh.meta.numBuckets == 16)
    val m = fresh.snapshot().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m.size == 400 && m(7L) == 7.7,
      s"merge landed under the wrong modulus: size=${m.size} v7=${m.get(7L)}")
    // and the row must be findable through bucket-pruned lookup (which
    // hashes with the NEW modulus — the corruption the epoch stamp prevents)
    val got = fresh.snapshotForKeys(Seq(7L).toDF("id")).collect()
    assert(got.length == 1 && got.head.getDouble(1) == 7.7)
  }

  test("merge racing a STEPPED rebucket's cutover detects the epoch change and replays") {
    // same protection as the monolithic case: the cutover commit stamps
    // epoch=newBuckets, so a merge whose plan predates it must replay
    // under the new modulus — and the stepped rewrite's own dirty diff
    // must absorb the merge that beat it to the claim
    val t = tmp()
    val df = (1L to 400L).map(i => (i, 0.0)).toDF("id", "v")
    val h1 = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    h1.upsert(df, uniqueKeys = true)
    val h2 = KeyedTable.forPath(spark, t)
    var fired = false
    h2.preCommitHook = () => if (!fired) { fired = true; h1.rebucketIncremental(16) }
    h2.upsert(Seq((7L, 7.7)).toDF("id", "v"), uniqueKeys = true)
    h2.preCommitHook = () => ()
    assert(h2.meta.numBuckets == 16, "loser did not pick up the new modulus")
    val fresh = KeyedTable.forPath(spark, t)
    assert(fresh.meta.numBuckets == 16)
    val m = fresh.snapshot().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m.size == 400 && m(7L) == 7.7,
      s"merge landed under the wrong modulus: size=${m.size} v7=${m.get(7L)}")
    val got = fresh.snapshotForKeys(Seq(7L).toDF("id")).collect()
    assert(got.length == 1 && got.head.getDouble(1) == 7.7)
  }

  test("changesSince touches only the pending commits' directories") {
    val t = tmp()
    val df = (1L to 50L).map(i => (i, 0.0)).toDF("id", "v")
    val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 2)
    kt.upsert(df, uniqueKeys = true)
    (1 to 29).foreach(i => kt.upsert(Seq((i.toLong, i * 1.0)).toDF("id", "v"), uniqueKeys = true))
    assert(kt.latestVersion == 30L)
    val lg = new CommitLog(t, spark.sessionState.newHadoopConf())
    val tail = kt.changesSince(29L)
    val dirs = tail.inputFiles.map { f =>
      val i = f.indexOf("/cdf/"); f.substring(i + 5).split('/').head
    }.toSet
    assert(dirs == Set(lg.dirOf(30L)),
      s"1-commit drain read dirs $dirs, expected only ${lg.dirOf(30L)}")
    assert(tail.count() == 2) // pre+post image of one key
  }

  test("two threaded drainers over one pipeline converge exactly-once") {
    import graft.streaming.{Stream, Pipeline}
    import graft.Tables
    val root = tmp()
    val sf = "/root/testdata/sf0.001"
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    oT.upsert(oDf, uniqueKeys = true)
    def mkPipe(): Pipeline = {
      val src = KeyedTable.forPath(spark, s"$root/o")
      Stream.fromKeyedTable(src)
        .groupBy("o_orderstatus")
        .agg(sum("o_totalprice").as("total"), count(lit(1)).as("cnt"))
        .writeToPath(s"$root/agg")
    }
    // wave 1 drained normally to seed the output table
    mkPipe().runIncremental()
    // repeated waves: an update, then TWO racing drainers — the
    // non-idempotent delta merge must apply exactly once, and the
    // drain-state reads must survive the rival's overwrite-rename
    // windows (the r9 flake: ChecksumException from an unguarded
    // first read). Repetitions make the race land, like OccSpec.
    val reps = sys.props.getOrElse("graft.test.drainReps", "8").toInt
    (1 to reps).foreach { rep =>
      oT.upsert(oDf.where(col("o_orderkey") % 3 === rep % 3)
        .withColumn("o_totalprice", col("o_totalprice") + 10.0 * rep), uniqueKeys = true)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = (1 to 2).map { _ =>
        new Thread { override def run(): Unit =
          try mkPipe().runIncremental()
          catch { case e: Throwable => errs.add(e) } }
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(errs.isEmpty, s"rep $rep: drainer threw: ${errs.peek()}")
      val got = KeyedTable.forPath(spark, s"$root/agg").snapshot()
        .select(col("o_orderstatus"), round(col("total"), 2).as("total"), col("cnt"))
      val want = oT.snapshot().groupBy("o_orderstatus")
        .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("cnt"))
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"rep $rep: racing drainers double- or under-applied a delta")
    }
  }
}
