package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/** Minimal JSON commit log for a [[KeyedTable]].
  *
  * Layout under `<table>/_log/`:
  *   - `_meta.json`                 — table definition (written once)
  *   - `%020d.json` per commit      — `{"version":N,"buckets":[...]}`
  *
  * Replay folds commits in version order into `bucket -> last version
  * that rewrote it`; a snapshot at version V reads, for every bucket,
  * the newest rewrite ≤ V. Commit files are written to a temp name and
  * renamed, so readers never observe a partial commit (same recovery
  * contract as Delta's `_delta_log`, re-expressed on raw Hadoop FS).
  *
  * Uses the Hadoop FileSystem API throughout so the same code runs on
  * HDFS/S3A on a real cluster, not just local fs.
  */
final class CommitLog(rootPath: String, conf: Configuration) {
  private val logDir = new Path(rootPath, "_log")
  private def fs: FileSystem = logDir.getFileSystem(conf)

  def exists: Boolean = fs.exists(new Path(logDir, "_meta.json"))

  def writeMeta(json: String): Unit = {
    fs.mkdirs(logDir)
    writeAtomic(new Path(logDir, "_meta.json"), json, overwrite = true)
  }

  def readMeta(): String = readFully(new Path(logDir, "_meta.json"))

  /** All committed versions in ascending order. */
  def versions(): Seq[Long] = {
    if (!fs.exists(logDir)) return Nil
    fs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("_"))
      .map(_.stripSuffix(".json").toLong)
      .sorted
  }

  def latestVersion(): Long = versions().lastOption.getOrElse(0L)

  /** bucket -> newest version ≤ `upTo` that rewrote it; buckets whose
    * latest action emptied them are absent. Replays from the newest
    * checkpoint ≤ `upTo` (if any) plus the commit tail after it, so
    * open/replay cost on a long-lived table is O(checkpoint interval),
    * not O(total commits) — the same role as Delta's log checkpoints. */
  def bucketVersions(upTo: Long): Map[Int, Long] = {
    val ck = latestCheckpointAt(upTo)
    var acc = ck.map(_._2).getOrElse(Map.empty[Int, Long])
    val from = ck.map(_._1).getOrElse(-1L)
    versions().iterator.filter(v => v > from && v <= upTo).foreach { v =>
      val json = readFully(commitPath(v))
      parseIntArray(json, "buckets").foreach(b => acc += b -> v)
      parseIntArray(json, "emptied").foreach(b => acc -= b)
    }
    acc
  }

  /** Writes a full bucket-map checkpoint as of `version`. */
  def checkpoint(version: Long, map: Map[Int, Long], maxBatchId: Long = -1L): Unit = {
    val entries = map.toSeq.sortBy(_._1)
      .map { case (b, v) => s"[$b,$v]" }.mkString(",")
    writeAtomic(ckptPath(version),
      s"""{"version":$version,"maxBatchId":$maxBatchId,"entries":[$entries]}""")
  }

  /** Newest checkpoint at or below `upTo`:
    * (version, bucket map, maxBatchId). */
  def latestCheckpointAt(upTo: Long): Option[(Long, Map[Int, Long], Long)] = {
    if (!fs.exists(logDir)) return None
    val cks = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("_ckpt_") && n.endsWith(".json"))
      .map(_.stripPrefix("_ckpt_").stripSuffix(".json").toLong)
      .filter(_ <= upTo)
    if (cks.isEmpty) None
    else {
      val v = cks.max
      val json = readFully(ckptPath(v))
      val entriesPart = json.substring(json.indexOf("\"entries\""))
      val pairs = """\[(\d+),(\d+)\]""".r.findAllMatchIn(entriesPart)
        .map(m => m.group(1).toInt -> m.group(2).toLong)
      val bid = """"maxBatchId":(-?\d+)""".r.findFirstMatchIn(json)
        .map(_.group(1).toLong).getOrElse(-1L)
      Some((v, pairs.toMap, bid))
    }
  }

  private def ckptPath(v: Long) = new Path(logDir, f"_ckpt_$v%020d.json")

  /** `batchId` ≥ 0 marks this commit as the effect of a streaming
    * microbatch — replayed batches (failure recovery re-runs the last
    * foreachBatch) are detected via [[maxBatchIdAt]] and skipped, which
    * is what makes incremental agg merges exactly-once. */
  def commit(version: Long, buckets: Seq[Int], emptied: Seq[Int] = Nil,
      batchId: Long = -1L, cdfBytes: Long = -1L): Unit = {
    val bid = if (batchId >= 0) s""","batchId":$batchId""" else ""
    val cb = if (cdfBytes >= 0) s""","cdfBytes":$cdfBytes""" else ""
    val json = s"""{"version":$version,"buckets":[${buckets.mkString(",")}],""" +
      s""""emptied":[${emptied.mkString(",")}]$bid$cb}"""
    writeAtomic(commitPath(version), json)
  }

  /** (version, cdf byte size) for commits in `(fromExclusive, upTo]`,
    * ascending; -1 for commits that predate size recording. Feeds the
    * size-aware incremental drain (a month of backlog must not become
    * one giant merge). */
  def cdfBytesByVersion(fromExclusive: Long, upTo: Long): Seq[(Long, Long)] =
    versions().filter(v => v > fromExclusive && v <= upTo).map { v =>
      val json = readFully(commitPath(v))
      v -> """"cdfBytes":(-?\d+)""".r.findFirstMatchIn(json)
        .map(_.group(1).toLong).getOrElse(-1L)
    }

  /** Highest streaming batchId recorded at or below `upTo`; -1 if none.
    * Replays from the newest checkpoint like [[bucketVersions]]. */
  def maxBatchIdAt(upTo: Long): Long = {
    val ck = latestCheckpointAt(upTo)
    val from = ck.map(_._1).getOrElse(-1L)
    var acc = ck.map(_._3).getOrElse(-1L)
    versions().iterator.filter(v => v > from && v <= upTo).foreach { v =>
      val json = readFully(commitPath(v))
      """"batchId":(-?\d+)""".r.findFirstMatchIn(json)
        .foreach(m => acc = math.max(acc, m.group(1).toLong))
    }
    acc
  }

  private def commitPath(v: Long) = new Path(logDir, f"$v%020d.json")

  def hasCommit(v: Long): Boolean = fs.exists(commitPath(v))

  // --- rebucket two-phase marker (SURVEY §6f-7) ---------------------------
  // A rebucket changes the hash modulus every future merge prunes with;
  // the marker makes the (data write → commit → meta write) sequence
  // crash-recoverable: marker + commit present ⇒ roll FORWARD (finish
  // the meta write); marker without its commit ⇒ roll BACK (drop the
  // orphan data dir). Without it, a crash between commit and meta write
  // would leave merges bucketing batches with the OLD modulus against a
  // NEW-modulus bucket map — silently merging into the wrong buckets.
  private def rebucketPath = new Path(logDir, "_rebucket.json")

  def writeRebucketMarker(version: Long, numBuckets: Int): Unit =
    writeAtomic(rebucketPath,
      s"""{"version":$version,"numBuckets":$numBuckets}""", overwrite = true)

  def readRebucketMarker(): Option[(Long, Int)] =
    if (!fs.exists(rebucketPath)) None
    else {
      val json = readFully(rebucketPath)
      for {
        v <- """"version":(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
        n <- """"numBuckets":(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)
      } yield (v, n)
    }

  def clearRebucketMarker(): Unit =
    if (fs.exists(rebucketPath)) fs.delete(rebucketPath, false)

  private def parseIntArray(json: String, field: String): Seq[Int] = {
    val m = (s""""$field":\\[([0-9,\\s]*)\\]""").r.findFirstMatchIn(json)
    m.map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
      .getOrElse(Nil)
  }

  private def writeAtomic(target: Path, content: String,
      overwrite: Boolean = false): Unit = {
    val tmp = new Path(target.getParent, s".${target.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    var ok = fs.rename(tmp, target)
    if (!ok && overwrite && fs.exists(target)) {
      // Hadoop rename refuses to clobber an existing target, but a meta
      // REWRITE (schema evolution) must replace it. Commit files keep
      // overwrite=false: there a failed rename means a concurrent
      // writer won, and backing off is the correct race semantics.
      fs.delete(target, false)
      ok = fs.rename(tmp, target)
    }
    if (!ok) {
      fs.delete(tmp, false)
      // a concurrent writer won the rename — single-writer tables never hit this
      if (!fs.exists(target)) sys.error(s"commit rename failed: $target")
    }
  }

  private def readFully(p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }
}
