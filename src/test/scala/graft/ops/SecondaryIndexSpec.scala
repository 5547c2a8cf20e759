package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.store.KeyedTable
import java.nio.file.Files

class SecondaryIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("sidx").toString

  test("lookup tracks moved and deleted values through refresh") {
    val df = (1L to 500L).map(i => (i, s"cat${i % 10}", i * 2.0)).toDF("id", "cat", "v")
    val base = KeyedTable.create(spark, tmp(), df.schema, keys = Seq("id"), numBuckets = 8)
    base.upsert(df, uniqueKeys = true)
    val idx = SecondaryIndex.create(spark, tmp(), base, "cat", numBuckets = 8)
    val v0 = base.latestVersion
    // move id 42 from cat2 to catX; delete id 43
    base.upsert(Seq((42L, "catX", 84.0)).toDF("id", "cat", "v"), uniqueKeys = true)
    base.delete(Seq(43L).toDF("id"))
    SecondaryIndex.refresh(idx, base, v0)
    def ids(cat: String): Set[Long] =
      SecondaryIndex.lookup(idx, base, Seq(cat).toDF("cat"))
        .select("id").collect().map(_.getLong(0)).toSet
    assert(ids("catX") == Set(42L))
    assert(!ids("cat2").contains(42L), "moved id still indexed under old value")
    assert(!ids("cat3").contains(43L), "deleted id still returned") // 43 % 10 = 3
    assert(ids("cat5").contains(45L))
  }

  test("index probe prunes to the value's bucket at the file level") {
    val df = (1L to 2000L).map(i => (i, s"k${i % 50}", i * 1.0)).toDF("id", "cat", "v")
    val base = KeyedTable.create(spark, tmp(), df.schema, keys = Seq("id"), numBuckets = 8)
    base.upsert(df, uniqueKeys = true)
    val idx = SecondaryIndex.create(spark, tmp(), base, "cat", numBuckets = 16)
    val probe = idx.snapshotForKeys(Seq("k7").toDF("cat"))
    assert(probe.count() == 40) // 2000 / 50
    assert(probe.inputFiles.length <= 2,
      s"index probe read ${probe.inputFiles.length} of 16 bucket files")
  }

  test("deleteByValues: partial-key delete is bucket-pruned through the index") {
    val df = (1L to 4000L).map(i => (i, s"cat${i % 500}", i * 1.0)).toDF("id", "cat", "v")
    val t = tmp()
    val base = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 16)
    base.upsert(df, uniqueKeys = true)
    val idx = SecondaryIndex.create(spark, tmp(), base, "cat", numBuckets = 16)
    val preV = base.latestVersion
    val v = SecondaryIndex.deleteByValues(idx, base, Seq("cat7").toDF("cat"))
    assert(v == preV + 1)
    // contents: exactly cat7's 8 rows gone
    assert(base.snapshot().count() == 3992)
    assert(base.snapshot().where(col("cat") === "cat7").count() == 0)
    // pruned: the delete commit rewrote only the buckets holding cat7's
    // 8 ids — KeyedTable.delete's raw partial-key path would have read
    // and rewritten ALL 16 live buckets
    val lg = new graft.store.CommitLog(t, spark.sessionState.newHadoopConf())
    val rewritten = lg.readCommit(v).buckets.size
    val hit = df.where(col("cat") === "cat7")
      .select(pmod(xxhash64(col("id")), lit(16)).cast("int")).distinct().count()
    assert(rewritten <= hit,
      s"delete rewrote $rewritten buckets; only $hit hold matching keys")
    // stale-entry safety: re-running after the rows are gone is a no-op
    assert(SecondaryIndex.deleteByValues(idx, base, Seq("cat7").toDF("cat")) == v)
  }

  test("refresh replay with the same batchId is exactly-once") {
    val df = (1L to 100L).map(i => (i, s"c${i % 5}", 1.0)).toDF("id", "cat", "v")
    val base = KeyedTable.create(spark, tmp(), df.schema, keys = Seq("id"), numBuckets = 4)
    base.upsert(df, uniqueKeys = true)
    val idx = SecondaryIndex.create(spark, tmp(), base, "cat", numBuckets = 4)
    val v0 = base.latestVersion
    base.upsert(Seq((7L, "cNew", 2.0)).toDF("id", "cat", "v"), uniqueKeys = true)
    SecondaryIndex.refresh(idx, base, v0, batchId = 10L)
    val after = idx.latestVersion
    SecondaryIndex.refresh(idx, base, v0, batchId = 10L) // replayed microbatch
    // the upsert half is skipped; only the (idempotent) stale delete may re-run
    assert(idx.snapshot().where(col("cat") === "cNew").count() == 1)
    assert(idx.latestVersion <= after + 1)
  }

  test("replayed refresh keeps an entry whose value went A→B→A in the range") {
    val df = (1L to 100L).map(i => (i, s"c${i % 5}", 1.0)).toDF("id", "cat", "v")
    val base = KeyedTable.create(spark, tmp(), df.schema, keys = Seq("id"), numBuckets = 4)
    base.upsert(df, uniqueKeys = true)
    val idx = SecondaryIndex.create(spark, tmp(), base, "cat", numBuckets = 4)
    val v0 = base.latestVersion
    // id 7: c2 → cB → c2 within one refresh range, so (c2, 7) is BOTH the
    // live entry and a pre-image of the range — a replay that re-runs the
    // stale delete while the batchId guard skips the upsert would lose it
    base.upsert(Seq((7L, "cB", 2.0)).toDF("id", "cat", "v"), uniqueKeys = true)
    base.upsert(Seq((7L, "c2", 3.0)).toDF("id", "cat", "v"), uniqueKeys = true)
    SecondaryIndex.refresh(idx, base, v0, batchId = 5L)
    def c2ids: Set[Long] =
      SecondaryIndex.lookup(idx, base, Seq("c2").toDF("cat"))
        .select("id").collect().map(_.getLong(0)).toSet
    assert(c2ids.contains(7L))
    SecondaryIndex.refresh(idx, base, v0, batchId = 5L) // completed refresh, replayed
    assert(c2ids.contains(7L), "replayed refresh deleted the live A→B→A entry")
  }
}
