package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import java.nio.file.Files

/** r15 optimization pin: the per-merge hash sort runs ONLY when some
  * bucket's rewrite can split into several files (maxRecordsPerFile is
  * applied per (side, bucket) write partition). The decision is
  * per-bucket output rows — manifest bytes at a conservative narrow
  * width plus exact staged counts — not total rewrite bytes: a seed
  * load spread over many buckets writes one footer-exact file per
  * bucket and skips the sort, while any path that CAN split (explicit
  * targetFileRows, a 2M+-row bucket, legacy input) still sorts so the
  * disjoint-range manifest geometry is preserved. */
class HashSortGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("hsort").toString

  private def kt(): KeyedTable = {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    KeyedTable.create(spark, tmp(), df.schema, keys = Seq("id"), numBuckets = 4)
  }

  test("decision table: per-bucket rows vs the file-row cap") {
    val t = kt()
    val cap = 1L << 21
    // seed-load shape: no read side, staged rows far below the cap in
    // every bucket — no sort
    assert(!t.hashSortNeeded(Some(Map.empty), Map(0 -> 100000L, 1 -> 100000L)))
    // a single bucket's staged rows at the cap — sort
    assert(t.hashSortNeeded(Some(Map.empty), Map(0 -> cap)))
    // EXACT manifest row counts (r16): 4M read rows in one bucket — sort
    assert(t.hashSortNeeded(Some(Map(0 -> (64L << 20, 4000000L))), Map.empty))
    // the same rows spread over many buckets stay under per-file rows —
    // no sort
    assert(!t.hashSortNeeded(
      Some((0 until 4).map(b => b -> (8L << 20, 500000L)).toMap),
      (0 until 4).map(b => b -> 100000L).toMap))
    // read side and staged side of ONE bucket sum: 1.5M exact read rows
    // + 0.7M staged = over the cap — sort
    assert(t.hashSortNeeded(Some(Map(2 -> (24L << 20, 1500000L))),
      Map(2 -> 700000L)))
    // a HIGHLY COMPRESSIBLE key column (r15 advice): 2.1M actual rows
    // zstd'd to 8 MB — the old bytes/16 estimate said 512k rows and
    // skipped the sort; exact footer counts sort
    assert(t.hashSortNeeded(Some(Map(0 -> (8L << 20, 2100000L))), Map.empty))
    // pre-r16 manifest entries (rows == -1) fall back to bytes/16:
    // 64 MB / 16 B-per-row = 4M est rows — sort
    assert(t.hashSortNeeded(Some(Map(0 -> (64L << 20, -1L))), Map.empty))
    // fallback under-threshold: 8 MB / 16 = 512k est rows — no sort
    assert(!t.hashSortNeeded(Some(Map(0 -> (8L << 20, -1L))), Map.empty))
    // legacy dirs (unknowable sizes) always sort
    assert(t.hashSortNeeded(None, Map.empty))
    // explicit targetFileRows (spec/compaction shapes) always sorts
    spark.conf.set("spark.graft.targetFileRows", "500")
    try assert(t.hashSortNeeded(Some(Map.empty), Map(0 -> 10L)))
    finally spark.conf.unset("spark.graft.targetFileRows")
  }

  test("a seed load skips the sort yet still yields footer-exact disjoint manifests") {
    val t = tmp()
    val df = (1L to 20000L).map(i => (i, i * 1.0)).toDF("id", "v")
    val table = KeyedTable.create(spark, t, df.schema, keys = Seq("id"), numBuckets = 4)
    table.upsert(df, uniqueKeys = true) // seed: unsorted single-file buckets
    val lg = new CommitLog(t, spark.sessionState.newHadoopConf())
    val m = lg.readCommit(1L).files.get
    assert(m.values.forall(_.size == 1), "each bucket must stay one file")
    // a point merge against the unsorted seed must still prune by the
    // footer-exact ranges and produce the right content
    table.upsert(Seq((7L, 70.0)).toDF("id", "v"), uniqueKeys = true)
    val got = table.snapshot().where(col("id") === 7L).select("v")
      .as[Double].collect()
    assert(got.toSeq == Seq(70.0))
    assert(table.snapshot().count() == 20000L)
  }
}
