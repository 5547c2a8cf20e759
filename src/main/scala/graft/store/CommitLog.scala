package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/** One data file of a bucket, as recorded in a commit manifest.
  *
  * @param path    table-root-relative path (`data/<dir>/b=<B>/part-…`) —
  *                a commit may reference files under OLDER commits' dirs
  *                (carried forward untouched by a pruned merge)
  * @param minHash lowest `xxhash64(bucketKeys)` of any row in the file
  * @param maxHash highest; files are written key-hash-sorted, so within
  *                one commit a bucket's files cover disjoint ranges
  * @param bytes   file length — drives the skip-vs-scan economics (exact
  *                pruning only pays when it skips real bytes) and the
  *                auto-compact small-file policy; 0 for entries written
  *                before the field existed (treated as small)
  * @param stats   per-column [min,max] zone maps (Delta data-skipping
  *                stats analog) as stored strings, keyed by column name;
  *                decoded lazily against the table schema by
  *                [[ZoneStats.parse]]. Empty for entries written before
  *                the field existed — such files are never skipped.
  * @param bloom   true when every row group of the file carries a parquet
  *                bloom filter on the stored key-hash column — the merge
  *                planner's membership probe then tests staged hashes
  *                against the footer-resident sketches driver-side (a few
  *                KB tail reads) instead of launching a column-scan job.
  *                False for pre-sketch files; those fall back to the
  *                exact read probe.
  */
final case class FileEntry(path: String, minHash: Long, maxHash: Long,
    bytes: Long = 0L, stats: Map[String, ColStat] = Map.empty,
    bloom: Boolean = false, rows: Long = -1L)

/** One parsed commit. `dir` is the data/cdf directory name the commit's
  * files live under (`data/<dir>/b=<bucket>`, `cdf/<dir>/`) — unique per
  * commit ATTEMPT so concurrent optimistic writers never collide on the
  * filesystem before the commit rename decides the winner (SURVEY §6g-1).
  * Commits written before multi-writer support default to `v=<version>`.
  *
  * `files` is the file-granular manifest: for every bucket this commit
  * touched, the COMPLETE current file list (new files + carried-forward
  * references) — the role of Delta's add actions. `None` on commits that
  * predate manifests; readers fall back to listing `data/<dir>/b=<B>`. */
final class CommitInfo(
    val version: Long,
    val buckets: Seq[Int],
    val emptied: Seq[Int],
    val batchId: Long,
    val cdfBytes: Long,
    val dir: String,
    filesThunk: () => Option[Map[Int, Seq[FileEntry]]],
    val epoch: Int,
    val cdfUp: Long = -1L,
    val cdfDel: Long = -1L,
    val cdfPre: Long = -1L) {
  /** LAZY: a spilled manifest's parquet sidecar is only read when a
    * consumer actually needs the file list — log replay
    * (bucketVersions/batchId folds) touches only the scalar fields, so
    * a 10k-commit tail with spilled manifests costs zero sidecar
    * reads. Memoized; commit parses are cached per version anyway. */
  lazy val files: Option[Map[Int, Seq[FileEntry]]] = filesThunk()
}

object CommitInfo {
  def apply(version: Long, buckets: Seq[Int], emptied: Seq[Int],
      batchId: Long, cdfBytes: Long, dir: String,
      files: Option[Map[Int, Seq[FileEntry]]] = None,
      epoch: Int = -1, cdfUp: Long = -1L, cdfDel: Long = -1L,
      cdfPre: Long = -1L): CommitInfo =
    new CommitInfo(version, buckets, emptied, batchId, cdfBytes, dir,
      () => files, epoch, cdfUp, cdfDel, cdfPre)

  def lazyFiles(version: Long, buckets: Seq[Int], emptied: Seq[Int],
      batchId: Long, cdfBytes: Long, dir: String,
      filesThunk: () => Option[Map[Int, Seq[FileEntry]]],
      epoch: Int, cdfUp: Long = -1L, cdfDel: Long = -1L,
      cdfPre: Long = -1L): CommitInfo =
    new CommitInfo(version, buckets, emptied, batchId, cdfBytes, dir,
      filesThunk, epoch, cdfUp, cdfDel, cdfPre)
}

/** Minimal JSON commit log for a [[KeyedTable]].
  *
  * Layout under `<table>/_log/`:
  *   - `_meta.json`                 — table definition (written once)
  *   - `%020d.json` per commit      — `{"version":N,"buckets":[...],"dir":...}`
  *
  * Replay folds commits in version order into `bucket -> last version
  * that rewrote it`; a snapshot at version V reads, for every bucket,
  * the newest rewrite ≤ V. Commit files are written to a temp name and
  * renamed, so readers never observe a partial commit, and the rename's
  * refuse-to-clobber semantics arbitrate concurrent writers — exactly
  * one caller of [[commit]] per version sees `true` (same recovery and
  * OCC contract as Delta's `_delta_log`, re-expressed on raw Hadoop FS;
  * on stores without atomic rename — plain S3 — a commit service is
  * required, the same caveat Delta documents).
  *
  * Commit files are immutable once visible, so parses are cached: a
  * drain loop that slices an n-commit backlog into m sub-batches reads
  * each commit file once, not O(n·m) times.
  */
final class CommitLog(rootPath: String, conf: Configuration) {
  private val logDir = new Path(rootPath, "_log")
  private def fs: FileSystem = logDir.getFileSystem(conf)

  /** Commits whose manifest has at least this many file entries spill
    * it to a parquet sidecar (`_log/_manifest_<dir>.parquet`) instead
    * of inlining JSON — a full-table rewrite at 2^14 buckets × ~8 files
    * would otherwise put tens of MB of JSON in ONE commit file parsed
    * by regex on every cold open (SURVEY §6k-5; Delta's parquet
    * checkpoint plays the same role). Live-read so sessions can tune
    * `spark.graft.manifest.spillEntries` at runtime. */
  @volatile var manifestSpillEntries: () => Int = () => 4096

  // commit files are write-once (losers back off, nobody rewrites), so a
  // parse cached per version can never go stale; external writers only
  // ADD versions, which listing picks up
  private val commitCache =
    new java.util.concurrent.ConcurrentHashMap[Long, CommitInfo]()

  // --- log truncation (Delta logRetention analog, SURVEY §6l-2) ---------
  // `_floor.json` records the highest TRUNCATED version and the
  // manifest-bearing checkpoint that backs reads of still-live files
  // owned by truncated commits. Loaded lazily; refreshed when a missing
  // commit file is encountered (another process may have truncated).
  @volatile private var floorCache: Option[(Long, Long)] = None
  private def floorPath = new Path(logDir, "_floor.json")

  private def loadFloor(fresh: Boolean = false): (Long, Long) = {
    val cached = floorCache
    if (!fresh && cached.isDefined) cached.get
    else {
      // a fresh floor read means truncation may have happened under us:
      // the listing memos must not serve pre-truncation state (the
      // synthesizeTruncated path resolves its checkpoint through them)
      if (fresh) { ckptListCache = null; versionsCache = null }
      val f =
        if (!fs.exists(floorPath)) (-1L, -1L)
        else {
          val json = readFully(floorPath)
          (""""floor":(-?\d+)""".r.findFirstMatchIn(json)
            .map(_.group(1).toLong).getOrElse(-1L),
           """"ckpt":(-?\d+)""".r.findFirstMatchIn(json)
            .map(_.group(1).toLong).getOrElse(-1L))
        }
      floorCache = Some(f)
      f
    }
  }

  /** Highest truncated version; -1 when the log was never truncated.
    * Snapshots, change feeds, and time travel at or below the floor are
    * unavailable (the reference stack's Delta logRetention contract). */
  def truncationFloor: Long = loadFloor()._1

  /** Truncation floor for serving a read window starting just above
    * `fromExclusive`, stale-proof across processes: a long-lived handle
    * caches floor=-1, another process truncates, and the cached guard
    * would pass while `versions()` silently lists only the retained
    * tail. Commit ids are sequential, so a listed head ABOVE
    * `fromExclusive + 1` means commits this read needs are gone —
    * re-read the floor file before answering, so the caller's
    * below-floor require fails loudly instead of serving a partial
    * feed. Costs one floor-file read only on the gap path. */
  def floorForRead(fromExclusive: Long): Long = {
    val cached = loadFloor()._1
    if (fromExclusive < cached) cached
    else if (versions().headOption.exists(h => fromExclusive + 1 < h))
      loadFloor(fresh = true)._1
    else cached
  }

  private[store] def writeFloor(floor: Long, ckptV: Long): Unit = {
    writeAtomic(floorPath, s"""{"floor":$floor,"ckpt":$ckptV}""",
      overwrite = true)
    floorCache = Some((floor, ckptV))
  }

  /** Full checkpoint carrying the live FILE manifest (not just bucket
    * versions) as a parquet sidecar — commits at or below it become
    * deletable because every still-referenced file list survives here. */
  private[store] def checkpointWithManifest(version: Long, map: Map[Int, Long],
      maxBatchId: Long, files: Map[Int, Seq[FileEntry]]): Unit = {
    val ref = writeManifestParquet(s"ckpt-$version", files)
    val entries = map.toSeq.sortBy(_._1)
      .map { case (b, v) => s"[$b,$v]" }.mkString(",")
    writeAtomic(ckptPath(version),
      s"""{"version":$version,"maxBatchId":$maxBatchId,"filesRef":"$ref","entries":[$entries]}""",
      overwrite = true)
    ckptListCache = null
  }

  private def checkpointManifest(v: Long): Option[Map[Int, Seq[FileEntry]]] = {
    if (!fs.exists(ckptPath(v))) None
    else """"filesRef":"([^"]+)"""".r.findFirstMatchIn(readFully(ckptPath(v)))
      .map(m => readManifestParquet(m.group(1)))
  }

  /** Deletes commit files (and their spilled manifest sidecars) at or
    * below `floor`, plus superseded checkpoints/manifest sidecars.
    * Callers must have written the floor marker and a covering
    * manifest checkpoint FIRST — see KeyedTable.truncateLog. */
  private[store] def deleteCommitsUpTo(floor: Long): Unit = {
    versions().filter(_ <= floor).foreach { v =>
      val dir = try Some(readCommit(v).dir) catch { case _: Exception => None }
      dir.foreach(d =>
        fs.delete(new Path(logDir, manifestSidecarName(d)), false))
      fs.delete(commitPath(v), false)
      commitCache.remove(v)
    }
    fs.listStatus(logDir).foreach { st =>
      val n = st.getPath.getName
      def numSuffix(pre: String, suf: String): Option[Long] =
        if (n.startsWith(pre) && n.endsWith(suf))
          scala.util.Try(n.stripPrefix(pre).stripSuffix(suf).toLong).toOption
        else None
      if (numSuffix("_ckpt_", ".json").exists(_ <= floor) ||
          numSuffix("_manifest_ckpt-", ".parquet").exists(_ <= floor))
        fs.delete(st.getPath, false)
    }
    versionsCache = null
    ckptListCache = null
  }

  /** A truncated commit that still OWNS live buckets (untouched since
    * before the floor) synthesizes its file lists from the floor
    * checkpoint's manifest — everything else about it is gone. */
  private def synthesizeTruncated(v: Long, ckptV: Long): CommitInfo = {
    val owned = latestCheckpointAt(ckptV) match {
      case Some((cv, map, _)) if cv == ckptV =>
        map.collect { case (b, ver) if ver == v => b }.toSeq
      case _ => Nil
    }
    val files = checkpointManifest(ckptV)
      .map(m => m.filter { case (b, _) => owned.contains(b) })
    val info = CommitInfo(v, owned, Nil, -1L, -1L, s"v=$v", files, -1)
    commitCache.put(v, info)
    info
  }

  def exists: Boolean = fs.exists(new Path(logDir, "_meta.json"))

  def writeMeta(json: String): Unit = {
    fs.mkdirs(logDir)
    writeAtomic(new Path(logDir, "_meta.json"), json, overwrite = true)
  }

  def readMeta(): String = readFully(new Path(logDir, "_meta.json"))

  // Listing memo: `versions()` backs every read-path entry point
  // (changesSince, floor guards, bucketVersions, drains), and against
  // an object store at 10k+ commits the per-call directory listing is
  // the dominant metadata latency. The memo is validated by TWO O(1)
  // existence probes instead of a listing:
  //  - TOP: the OCC claim protocol makes committed versions DENSE (a
  //    writer only ever claims base+1 after listing base, and losers
  //    back off), so no commit > last can exist unless last+1 does;
  //  - BOTTOM: truncation deletes contiguously from the lowest version
  //    up (deleteCommitsUpTo), so the cached head still existing means
  //    no cross-process truncation removed cached entries — this is
  //    what keeps floorForRead's listed-head gap detection working.
  // Local writers update the memo in commit()/deleteCommitsUpTo.
  @volatile private var versionsCache: Seq[Long] = null

  /** All committed versions in ascending order. */
  def versions(): Seq[Long] = {
    val cached = versionsCache
    val fresh =
      cached != null &&
        !fs.exists(commitPath(cached.lastOption.getOrElse(0L) + 1)) &&
        cached.headOption.forall(h => fs.exists(commitPath(h)))
    if (fresh) cached
    else {
      val listed = listVersions()
      versionsCache = listed
      ckptListCache = null // new commits may carry new checkpoints
      listed
    }
  }

  private def listVersions(): Seq[Long] = {
    if (!fs.exists(logDir)) return Nil
    fs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("_") && !n.startsWith("."))
      .map(_.stripSuffix(".json").toLong)
      .sorted
  }

  def latestVersion(): Long = versions().lastOption.getOrElse(0L)

  /** Cached parse of one commit file. Truncated commits (log
    * truncation floor) synthesize their still-live file lists from the
    * floor checkpoint's manifest. */
  def readCommit(v: Long): CommitInfo = {
    val cached = commitCache.get(v)
    if (cached != null) cached
    else readCommitUncached(v)
  }

  private def readCommitUncached(v: Long): CommitInfo = {
    {
      val json = try readFully(commitPath(v)) catch {
        case e: java.io.FileNotFoundException =>
          val (floor, ckptV) = loadFloor(fresh = true)
          if (v <= floor && ckptV >= 0) return synthesizeTruncated(v, ckptV)
          else throw e
      }
      val filesRef = """"filesRef":"([^"]+)"""".r.findFirstMatchIn(json)
        .map(_.group(1))
      val info = CommitInfo.lazyFiles(
        version = v,
        buckets = parseIntArray(json, "buckets"),
        emptied = parseIntArray(json, "emptied"),
        batchId = """"batchId":(-?\d+)""".r.findFirstMatchIn(json)
          .map(_.group(1).toLong).getOrElse(-1L),
        cdfBytes = """"cdfBytes":(-?\d+)""".r.findFirstMatchIn(json)
          .map(_.group(1).toLong).getOrElse(-1L),
        dir = """"dir":"([^"]+)"""".r.findFirstMatchIn(json)
          .map(_.group(1)).getOrElse(s"v=$v"),
        filesThunk = filesRef match {
          case Some(ref) => () => Some(readManifestParquet(ref))
          case None      => val inline = parseFiles(json); () => inline
        },
        epoch = """"epoch":(-?\d+)""".r.findFirstMatchIn(json)
          .map(_.group(1).toInt).getOrElse(-1),
        cdfUp = """"cdfUp":(-?\d+)""".r.findFirstMatchIn(json)
          .map(_.group(1).toLong).getOrElse(-1L),
        cdfDel = """"cdfDel":(-?\d+)""".r.findFirstMatchIn(json)
          .map(_.group(1).toLong).getOrElse(-1L),
        cdfPre = """"cdfPre":(-?\d+)""".r.findFirstMatchIn(json)
          .map(_.group(1).toLong).getOrElse(-1L))
      commitCache.put(v, info)
      info
    }
  }

  // --- parquet manifest sidecar (SURVEY §6k-5) ----------------------------
  // Written driver-side with parquet-hadoop's Group API: no Spark job in
  // the commit hot path, no Spark dependency in the log layer. Sidecars
  // are written under an attempt-unique name BEFORE the commit claim, so
  // a losing attempt leaves only an unreferenced orphan (vacuumable),
  // never a dangling reference.

  private lazy val manifestSchema: org.apache.parquet.schema.MessageType =
    org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      """message graft_manifest {
           required int32 bucket;
           required binary path (STRING);
           required int64 minHash;
           required int64 maxHash;
           required int64 bytes;
           required binary stats (STRING);
           required int32 bloom;
           required int64 rows;
         }""")

  private def manifestSidecarName(dir: String) = s"_manifest_$dir.parquet"

  private def writeManifestParquet(dir: String,
      files: Map[Int, Seq[FileEntry]]): String = {
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    val name = manifestSidecarName(dir)
    val gconf = new Configuration(conf)
    GroupWriteSupport.setSchema(manifestSchema, gconf)
    fs.mkdirs(logDir)
    val writer = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(new Path(logDir, name), gconf))
      .withConf(gconf)
      // OVERWRITE keeps the write crash-retryable: a truncateLog that
      // died between this sidecar and the floor write must be able to
      // re-run at the same checkpoint version (the sidecar name is
      // deterministic there; commit sidecars are attempt-unique and
      // never collide either way)
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(
      manifestSchema)
    try files.toSeq.sortBy(_._1).foreach { case (b, es) =>
      es.foreach { e =>
        val g = factory.newGroup()
        g.add("bucket", b)
        g.add("path", e.path)
        g.add("minHash", e.minHash)
        g.add("maxHash", e.maxHash)
        g.add("bytes", e.bytes)
        g.add("stats", ZoneStats.encode(e.stats))
        g.add("bloom", if (e.bloom) 1 else 0)
        g.add("rows", e.rows)
        writer.write(g)
      }
    } finally writer.close()
    name
  }

  private def readManifestParquet(name: String): Map[Int, Seq[FileEntry]] = {
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new GroupReadSupport(), new Path(logDir, name))
      .withConf(conf).build()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, FileEntry)]
    try {
      var g = reader.read()
      while (g != null) {
        buf += g.getInteger("bucket", 0) -> FileEntry(
          g.getString("path", 0),
          g.getLong("minHash", 0), g.getLong("maxHash", 0),
          g.getLong("bytes", 0),
          ZoneStats.decode(g.getString("stats", 0)),
          // pre-sketch sidecars lack the field → no bloom, exact fallback
          bloom = g.getType.containsField("bloom") &&
            g.getInteger("bloom", 0) == 1,
          // pre-r16 sidecars lack row counts → -1, byte-estimate fallback
          rows = if (g.getType.containsField("rows")) g.getLong("rows", 0)
                 else -1L)
        g = reader.read()
      }
    } finally reader.close()
    buf.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSeq }
  }

  // manifest entries are flat strings "bucket|relpath|minHash|maxHash" —
  // parquet part names contain no '|', which keeps the log's regex-level
  // parser sound without a JSON library
  private def encodeFiles(files: Map[Int, Seq[FileEntry]]): String =
    files.toSeq.sortBy(_._1).flatMap { case (b, es) =>
      es.map { e =>
        s""""$b|${e.path}|${e.minHash}|${e.maxHash}|${e.bytes}|${ZoneStats.encode(e.stats)}|${if (e.bloom) 1 else 0}|${e.rows}""""
      }
    }.mkString(""","files":[""", ",", "]")

  private def parseFiles(json: String): Option[Map[Int, Seq[FileEntry]]] =
    """"files":\[([^\]]*)\]""".r.findFirstMatchIn(json).map { m =>
      m.group(1).split(",").map(_.trim).filter(_.nonEmpty)
        .map(_.stripPrefix("\"").stripSuffix("\""))
        .map { s =>
          val p = s.split('|')
          p(0).toInt -> FileEntry(p(1), p(2).toLong, p(3).toLong,
            if (p.length > 4) p(4).toLong else 0L,
            if (p.length > 5) ZoneStats.decode(p(5)) else Map.empty,
            bloom = p.length > 6 && p(6) == "1",
            rows = if (p.length > 7) p(7).toLong else -1L)
        }.toSeq.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2) }
    }

  /** Directory name (under `data/` and `cdf/`) of a commit's files. */
  def dirOf(v: Long): String = readCommit(v).dir

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
      val info = readCommit(v)
      info.buckets.foreach(b => acc += b -> v)
      info.emptied.foreach(b => acc -= b)
    }
    acc
  }

  /** Writes a full bucket-map checkpoint as of `version`. */
  def checkpoint(version: Long, map: Map[Int, Long], maxBatchId: Long = -1L): Unit = {
    val entries = map.toSeq.sortBy(_._1)
      .map { case (b, v) => s"[$b,$v]" }.mkString(",")
    writeAtomic(ckptPath(version),
      s"""{"version":$version,"maxBatchId":$maxBatchId,"entries":[$entries]}""")
    ckptListCache = null
  }

  // Checkpoint-name memo, same economics as the versions memo. A stale
  // entry is only ever COSTLY, never wrong: missing a newer checkpoint
  // means replaying more commits on top of an older one. The one case
  // needing freshness — synthesizeTruncated resolving the floor
  // checkpoint after a cross-process truncation — passes through
  // loadFloor(fresh = true), which invalidates this memo first.
  @volatile private var ckptListCache: Seq[Long] = null

  private def ckptVersions(): Seq[Long] = {
    val cached = ckptListCache
    if (cached != null) cached
    else {
      val listed =
        if (!fs.exists(logDir)) Nil
        else fs.listStatus(logDir).toSeq.map(_.getPath.getName)
          .filter(n => n.startsWith("_ckpt_") && n.endsWith(".json"))
          .map(_.stripPrefix("_ckpt_").stripSuffix(".json").toLong)
          .sorted
      ckptListCache = listed
      listed
    }
  }

  /** Newest checkpoint at or below `upTo`:
    * (version, bucket map, maxBatchId). A cross-process truncation
    * DELETES superseded `_ckpt_*` files, so a stale [[ckptListCache]]
    * can still list one — a read miss here invalidates the memo and
    * retries once against a fresh listing (mirroring readCommit's
    * missing-file → loadFloor(fresh) pattern) instead of surfacing a
    * FileNotFoundException for a checkpoint that no longer exists. */
  def latestCheckpointAt(upTo: Long): Option[(Long, Map[Int, Long], Long)] =
    try latestCheckpointAtOnce(upTo) catch {
      case _: java.io.FileNotFoundException =>
        ckptListCache = null
        latestCheckpointAtOnce(upTo)
    }

  private def latestCheckpointAtOnce(
      upTo: Long): Option[(Long, Map[Int, Long], Long)] = {
    val cks = ckptVersions().filter(_ <= upTo)
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

  /** Attempts to claim `version`. Returns true iff THIS caller's rename
    * won — the optimistic-concurrency arbiter: a false return means a
    * concurrent writer committed this version first and the caller must
    * re-read the new latest state and replay its batch.
    *
    * `batchId` ≥ 0 marks this commit as the effect of a streaming
    * microbatch — replayed batches (failure recovery re-runs the last
    * foreachBatch) are detected via [[maxBatchIdAt]] and skipped, which
    * is what makes incremental agg merges exactly-once. */
  /** `epoch` is the bucket modulus the commit's files were hashed with —
    * a writer whose plan predates a concurrent rebucket detects the
    * mismatch against its claim base's epoch and replays (SURVEY §6f-7:
    * the crash-marker protects a SINGLE writer's rebucket; the epoch
    * stamp protects racing writers). */
  def commit(version: Long, buckets: Seq[Int], emptied: Seq[Int] = Nil,
      batchId: Long = -1L, cdfBytes: Long = -1L, dir: String = null,
      files: Option[Map[Int, Seq[FileEntry]]] = None, epoch: Int = -1,
      cdfUp: Long = -1L, cdfDel: Long = -1L, cdfPre: Long = -1L): Boolean = {
    val d = if (dir == null) s"v=$version" else dir
    val bid = if (batchId >= 0) s""","batchId":$batchId""" else ""
    val cb = if (cdfBytes >= 0) s""","cdfBytes":$cdfBytes""" else ""
    // per-commit change-row counts (upserts = insert + update_postimage,
    // deletes) — lets a batch drain derive its microbatch's row/delete
    // profile from the log instead of running a count job over the feed
    val cc = if (cdfUp >= 0 && cdfDel >= 0)
      s""","cdfUp":$cdfUp,"cdfDel":$cdfDel""" +
        (if (cdfPre >= 0) s""","cdfPre":$cdfPre""" else "") else ""
    val ep = if (epoch >= 0) s""","epoch":$epoch""" else ""
    val fl = files match {
      case Some(m) if m.valuesIterator.map(_.size).sum >= manifestSpillEntries() =>
        s""","filesRef":"${writeManifestParquet(d, m)}""""
      case Some(m) => encodeFiles(m)
      case None => ""
    }
    val json = s"""{"version":$version,"buckets":[${buckets.mkString(",")}],""" +
      s""""emptied":[${emptied.mkString(",")}]$bid$cb$cc$ep$fl,"dir":"$d"}"""
    val won = writeAtomicClaiming(commitPath(version), json)
    if (won) {
      commitCache.put(version,
        CommitInfo(version, buckets, emptied, batchId, cdfBytes, d, files, epoch,
          cdfUp, cdfDel, cdfPre))
      // extend the listing memo in place when it was current through
      // our claim base; anything else (stale or cold) re-lists lazily
      val c = versionsCache
      versionsCache =
        if (c != null && c.lastOption.getOrElse(0L) == version - 1) c :+ version
        else null
    }
    won
  }

  /** (version, cdf byte size) for commits in `(fromExclusive, upTo]`,
    * ascending; -1 for commits that predate size recording. Feeds the
    * size-aware incremental drain; served from the commit cache so a
    * budgeted drain loop is O(n) over the backlog, not O(n·m). */
  def cdfBytesByVersion(fromExclusive: Long, upTo: Long): Seq[(Long, Long)] =
    versions().filter(v => v > fromExclusive && v <= upTo)
      .map(v => v -> readCommit(v).cdfBytes)

  /** Summed change-row counts `(upserts, deletes, preimages,
    * contributing commits)` over commits in `(fromExclusive, upTo]` —
    * the last field counts commits that actually carried change rows (a
    * 1-commit window's feed is key-unique by construction, letting a
    * drain skip its within-batch dedup). None if ANY commit in the
    * window predates count recording — callers must then fall back to
    * counting the feed itself. Served from the commit cache like
    * [[cdfBytesByVersion]]. */
  def cdfCountsBetween(fromExclusive: Long, upTo: Long)
      : Option[(Long, Long, Long, Int)] = {
    // a window reaching below the truncation floor would sum only the
    // retained tail — letting a drain whose watermark predates the
    // truncation silently skip the lost changes (a zero sum bypasses
    // the merge entirely). Force the changesBatch fallback instead,
    // which fails loudly on exactly this scenario.
    if (fromExclusive < floorForRead(fromExclusive)) return None
    var up = 0L; var del = 0L; var pre = 0L; var n = 0
    versions().iterator.filter(v => v > fromExclusive && v <= upTo).foreach { v =>
      val c = readCommit(v)
      if (c.cdfUp < 0 || c.cdfDel < 0) return None
      up += c.cdfUp; del += c.cdfDel
      // commits written before preimage recording count as "unknown
      // retractions present" so consumers stay conservative
      pre += (if (c.cdfPre >= 0) c.cdfPre else math.max(c.cdfUp, 1L))
      if (c.cdfUp + c.cdfDel > 0) n += 1
    }
    Some((up, del, pre, n))
  }

  /** Highest batchId among commits in `(fromExclusive, upTo]`; -1 if
    * none — the incremental freshening step for a batchId cache that
    * must see commits landed by CONCURRENT writers. */
  def maxBatchIdIn(fromExclusive: Long, upTo: Long): Long =
    versions().iterator.filter(v => v > fromExclusive && v <= upTo)
      .foldLeft(-1L)((acc, v) => math.max(acc, readCommit(v).batchId))

  /** Highest streaming batchId recorded at or below `upTo`; -1 if none.
    * Replays from the newest checkpoint like [[bucketVersions]]. */
  def maxBatchIdAt(upTo: Long): Long = {
    val ck = latestCheckpointAt(upTo)
    val from = ck.map(_._1).getOrElse(-1L)
    var acc = ck.map(_._3).getOrElse(-1L)
    versions().iterator.filter(v => v > from && v <= upTo).foreach { v =>
      acc = math.max(acc, readCommit(v).batchId)
    }
    acc
  }

  private def commitPath(v: Long) = new Path(logDir, f"$v%020d.json")

  def hasCommit(v: Long): Boolean =
    commitCache.containsKey(v) || fs.exists(commitPath(v))

  // --- rebucket two-phase marker (SURVEY §6f-7) ---------------------------
  // A rebucket changes the hash modulus every future merge prunes with;
  // the marker makes the (data write → commit → meta write) sequence
  // crash-recoverable: marker + commit present ⇒ roll FORWARD (finish
  // the meta write); marker without its commit ⇒ roll BACK (drop the
  // orphan data dir). Without it, a crash between commit and meta write
  // would leave merges bucketing batches with the OLD modulus against a
  // NEW-modulus bucket map — silently merging into the wrong buckets.
  private def rebucketPath = new Path(logDir, "_rebucket.json")

  def writeRebucketMarker(version: Long, numBuckets: Int, dir: String): Unit =
    writeAtomic(rebucketPath,
      s"""{"version":$version,"numBuckets":$numBuckets,"dir":"$dir"}""",
      overwrite = true)

  /** (version, numBuckets, dir name of the in-flight rewrite). */
  def readRebucketMarker(): Option[(Long, Int, String)] =
    if (!fs.exists(rebucketPath)) None
    else {
      val json = readFully(rebucketPath)
      for {
        v <- """"version":(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
        n <- """"numBuckets":(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)
      } yield (v, n, """"dir":"([^"]+)"""".r.findFirstMatchIn(json)
        .map(_.group(1)).getOrElse(s"v=$v"))
    }

  def clearRebucketMarker(): Unit =
    if (fs.exists(rebucketPath)) fs.delete(rebucketPath, false)

  /** Attempt-scoped marker clear: deletes the single-slot marker only
    * while it still names `dir`. The slot is shared — a newer rewrite
    * overwrites a retained loser's marker, and an unconditional clear
    * on the loser's abandon path would delete the NEW attempt's marker
    * (if that attempt then crashed between commit and meta swap,
    * recovery could not finish the swap). Read-check-delete narrows
    * the race to the FS primitive; the remaining window is the same
    * one every marker mutation already carries. */
  def clearRebucketMarkerIf(dir: String): Unit =
    if (readRebucketMarker().exists(_._3 == dir)) clearRebucketMarker()

  /** Marker file mtime — liveness evidence for the attempt it names
    * (recovery must not reclaim an attempt whose marker is younger than
    * the grace window: the writer may not have produced any files yet). */
  def rebucketMarkerMtime(): Option[Long] =
    try Some(fs.getFileStatus(rebucketPath).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  // --- stepped-rebucket progress record (SURVEY §6v-1) --------------------
  // KeyedTable.rebucketIncremental stages the new-modulus layout across
  // byte-budgeted, UNCOMMITTED steps; this single-slot record is what
  // makes the sequence resumable after a crash: per completed step it
  // stores the old-bucket range, the staging dir under `data/`, and the
  // (bucket -> version) map the step read — the cutover compares that
  // map against the current one to find ranges a concurrent writer
  // dirtied. The record never influences readers; it exists only for
  // the rewrite itself (resume) and vacuum (orphan-staging reclamation).
  private def rebucketStepsPath = new Path(logDir, "_rebucket_steps.json")

  def writeRebucketProgress(target: Int, source: Int, token: String,
      steps: Seq[(Int, Int, String, Seq[(Int, Long)])]): Unit = {
    val body = steps.map { case (lo, hi, dir, base) =>
      s"""{"lo":$lo,"hi":$hi,"dir":"$dir","base":[""" +
        base.map { case (b, v) => s"[$b,$v]" }.mkString(",") + "]}"
    }.mkString(",")
    writeAtomic(rebucketStepsPath,
      s"""{"target":$target,"source":$source,"token":"$token","steps":[$body]}""",
      overwrite = true)
  }

  /** (target modulus, source modulus, writer token, completed steps as
    * (lo, hi, staging dir, (bucket, version) base map)). */
  def readRebucketProgress()
      : Option[(Int, Int, String, Seq[(Int, Int, String, Seq[(Int, Long)])])] =
    if (!fs.exists(rebucketStepsPath)) None
    else {
      val json = readFully(rebucketStepsPath)
      for {
        t <- """"target":(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)
        s <- """"source":(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)
        k <- """"token":"([^"]+)"""".r.findFirstMatchIn(json).map(_.group(1))
      } yield {
        val steps =
          """\{"lo":(\d+),"hi":(\d+),"dir":"([^"]*)","base":\[([\[\]0-9,\s]*)\]\}""".r
            .findAllMatchIn(json).map { m =>
              val base = """\[(\d+),(\d+)\]""".r.findAllMatchIn(m.group(4))
                .map(p => p.group(1).toInt -> p.group(2).toLong).toSeq
              (m.group(1).toInt, m.group(2).toInt, m.group(3), base)
            }.toSeq
        (t, s, k, steps)
      }
    }

  def clearRebucketProgress(): Unit =
    if (fs.exists(rebucketStepsPath)) fs.delete(rebucketStepsPath, false)

  def rebucketProgressMtime(): Option[Long] =
    try Some(fs.getFileStatus(rebucketStepsPath).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  private def parseIntArray(json: String, field: String): Seq[Int] = {
    val m = (s""""$field":\\[([0-9,\\s]*)\\]""").r.findFirstMatchIn(json)
    m.map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
      .getOrElse(Nil)
  }

  /** Atomic create-if-absent: writes a temp file and publishes it as
    * `target` via [[AtomicClaim]] (HDFS: no-clobber rename; local FS:
    * `link(2)` — local rename is check-then-clobber and would let two
    * racing claims both "win"). Exactly one concurrent attempt
    * succeeds — that property IS the commit arbiter. Returns whether
    * THIS call won. */
  private def writeAtomicClaiming(target: Path, content: String): Boolean = {
    val tmp = new Path(target.getParent,
      s".${target.getName}.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val ok = AtomicClaim.publish(fs, tmp, target)
    if (!ok) {
      // a concurrent writer won the claim — caller replays; anything
      // else (no winner present) is a real FS failure
      if (!fs.exists(target)) sys.error(s"commit claim failed: $target")
    }
    ok
  }

  private def writeAtomic(target: Path, content: String,
      overwrite: Boolean = false): Unit = {
    if (!writeAtomicClaiming(target, content) && overwrite) {
      // a meta REwrite (schema evolution / rebucket) must replace the
      // existing file; commit files never take this path — there a
      // failed rename means a concurrent writer won, and backing off is
      // the correct race semantics
      fs.delete(target, false)
      if (!writeAtomicClaiming(target, content))
        sys.error(s"atomic overwrite failed: $target")
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
