package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import java.nio.file.Files

/** Parquet manifest sidecars (SURVEY §6k-5): a commit whose manifest
  * exceeds the spill threshold stores it as `_log/_manifest_*.parquet`
  * instead of inline JSON, so a full-table rewrite (optimize/rebucket
  * at 2^14 buckets) cannot put tens of MB of regex-parsed JSON in one
  * commit file. Readers (including cold opens) see identical manifests
  * either way.
  */
class ManifestSpillSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("mspill").toString

  test("large manifests round-trip through the parquet sidecar") {
    val t = tmp()
    val conf = spark.sessionState.newHadoopConf()
    val log = new CommitLog(t, conf)
    log.writeMeta("""{"keys":["id"]}""")
    log.manifestSpillEntries = () => 100
    val files: Map[Int, Seq[FileEntry]] = (0 until 64).map { b =>
      b -> (0 until 20).map(i => FileEntry(
        s"data/v=1/b=$b/part-$i.parquet", i * 1000L, i * 1000L + 999L,
        4096L + i,
        Map("v" -> ColStat(s"$i", s"${i + 10}", hasNulls = i % 2 == 0))))
    }.toMap
    assert(log.commit(1L, files.keys.toSeq, dir = "v=1", files = Some(files)))
    // the commit json itself stays tiny and references the sidecar
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_log", f"${1L}%020d.json")))
    assert(json.contains("\"filesRef\":"), json.take(200))
    assert(!json.contains("\"files\":["))
    assert(json.length < 1000, s"spilled commit json still ${json.length}B")
    // a COLD reader (fresh log instance, no cache) sees the same manifest
    val cold = new CommitLog(t, conf)
    assert(cold.readCommit(1L).files.contains(files))
  }

  test("below the threshold manifests stay inline") {
    val t = tmp()
    val log = new CommitLog(t, spark.sessionState.newHadoopConf())
    log.writeMeta("""{"keys":["id"]}""")
    log.manifestSpillEntries = () => 100
    val files = Map(0 -> Seq(FileEntry("data/v=1/b=0/p.parquet", 1L, 2L, 10L)))
    assert(log.commit(1L, Seq(0), dir = "v=1", files = Some(files)))
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_log", f"${1L}%020d.json")))
    assert(json.contains("\"files\":[") && !json.contains("filesRef"))
  }

  test("vacuum reclaims dead orphan sidecars, keeps referenced ones") {
    val t = tmp()
    spark.conf.set("spark.graft.manifest.spillEntries", "1")
    spark.conf.set("spark.graft.pendingGraceMs", "0")
    try {
      val df = (1L to 100L).map(i => (i, 1.0)).toDF("id", "v")
      val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"),
        numBuckets = 4)
      kt.upsert(df, uniqueKeys = true) // spills (threshold 1)
      // a losing attempt's orphan: same naming, no commit references it
      val orphan = java.nio.file.Paths.get(t, "_log",
        "_manifest_v=9-deadbeef.parquet")
      java.nio.file.Files.write(orphan, Array[Byte](1, 2, 3))
      kt.vacuum(retainVersions = 1)
      assert(!java.nio.file.Files.exists(orphan), "orphan sidecar survived")
      val kept = java.nio.file.Files.list(
          java.nio.file.Paths.get(t, "_log")).toArray
        .map(_.toString).filter(_.contains("_manifest_"))
      assert(kept.nonEmpty, "referenced sidecar was vacuumed away")
      // and the table still reads through its sidecar manifest
      assert(KeyedTable.forPath(spark, t).snapshot().count() == 100L)
    } finally {
      spark.conf.unset("spark.graft.manifest.spillEntries")
      spark.conf.unset("spark.graft.pendingGraceMs")
    }
  }

  test("1000+-file optimize: spilled manifest, cold open plans exactly") {
    val t = tmp()
    spark.conf.set("spark.graft.manifest.spillEntries", "8")
    spark.conf.set("spark.graft.targetFileRows", "2")
    try {
      val df = (1L to 2500L).map(i => (i, i * 1.5)).toDF("id", "v")
      val kt = KeyedTable.create(spark, t, df.schema, keys = Seq("id"),
        numBuckets = 16)
      kt.upsert(df, uniqueKeys = true)
      kt.upsert((1L to 500L).map(i => (i, i * 2.0)).toDF("id", "v"),
        uniqueKeys = true)
      kt.optimize(sortCols = Seq("id"))
      val expect = (1L to 2500L)
        .map(i => i -> (if (i <= 500) i * 2.0 else i * 1.5)).toMap
      // the optimize rewrote into 1000+ files (2-row cap) and spilled;
      // the commit json itself stays reference-sized
      val v = kt.latestVersion
      val log = new CommitLog(t, spark.sessionState.newHadoopConf())
      val nFiles = log.readCommit(v).files.get.valuesIterator.map(_.size).sum
      assert(nFiles >= 1000, s"wanted a 1000+-file optimize, got $nFiles")
      val json = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(t, "_log", f"$v%020d.json")))
      assert(json.contains("filesRef") && json.length < 1000,
        s"optimize commit json is ${json.length}B")
      val logDir = java.nio.file.Paths.get(t, "_log")
      val sidecars = java.nio.file.Files.list(logDir).toArray
        .map(_.toString).filter(_.contains("_manifest_"))
      assert(sidecars.nonEmpty, "optimize manifest did not spill")
      // cold open: fresh handle, fresh log, no warm caches
      val cold = KeyedTable.forPath(spark, t)
      val got = cold.snapshot().collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expect)
      // file-granular point read still prunes through the sidecar manifest
      val one = cold.snapshotForKeys(Seq(7L).toDF("id"))
      assert(one.collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq ==
        Seq(7L -> 14.0))
      assert(one.inputFiles.length < cold.snapshot().inputFiles.length)
    } finally {
      spark.conf.unset("spark.graft.manifest.spillEntries")
      spark.conf.unset("spark.graft.targetFileRows")
    }
  }
}
