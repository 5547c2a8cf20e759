package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Persisted high-water marks for a batch-incrementally drained stage
  * (`Pipeline.runIncremental`): the last drained commit version of
  * every source table plus the next merge batchId.
  *
  * Crash safety is write-ahead-intent: a drain writes `intent` (the
  * post-drain state) BEFORE merging and promotes it to `state` after.
  * Recovery on the next load: if the output table's applied-batchId
  * marker shows the intent's merge landed, the intent is promoted;
  * otherwise it is discarded and the range is re-drained (the merge's
  * own batchId guard makes a half-landed replay a no-op). Single
  * writer per stage, like every KeyedTable.
  */
private[streaming] object DrainState {
  final case class St(versions: Map[String, Long], next: Long)

  /** Test seam: fired (with the drain dir) on entry to [[commit]] —
    * throwing simulates a drainer killed AFTER its merge landed but
    * BEFORE the intent→state promotion, the recovery window
    * [[loadRecovering]] promotes-and-replays. Always reset in a
    * finally. */
  @volatile private[streaming] var preStateCommitHook: String => Unit = _ => ()

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def read(f: org.apache.hadoop.fs.FileSystem, p: Path): St = {
    val in = f.open(p)
    try {
      val props = new java.util.Properties()
      props.load(in)
      val next = props.getProperty("next", "0").toLong
      import scala.jdk.CollectionConverters._
      val versions = props.stringPropertyNames().asScala.toSeq
        .filter(_.startsWith("v."))
        .map(k => k.stripPrefix("v.") -> props.getProperty(k).toLong).toMap
      St(versions, next)
    } finally in.close()
  }

  private def write(f: org.apache.hadoop.fs.FileSystem, p: Path, st: St): Unit = {
    val props = new java.util.Properties()
    props.setProperty("next", st.next.toString)
    st.versions.foreach { case (k, v) => props.setProperty(s"v.$k", v.toString) }
    val out = f.create(p, true)
    try props.store(out, null) finally out.close()
  }

  /** Atomically replaces `p` with `st` (tmp write + overwrite rename):
    * a concurrent reader always sees the old or the new content, never
    * an absent file — the state file must never be absent once written
    * (load() would restart history from zero). */
  private def writeAtomic(spark: SparkSession,
      f: org.apache.hadoop.fs.FileSystem, p: Path, st: St): Unit = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.getUri, spark.sessionState.newHadoopConf())
    var attempts = 0
    while (true) {
      val tmp = new Path(p.getParent,
        s".${p.getName}.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
      write(f, tmp, st)
      try {
        fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        return
      } catch {
        // two racing OVERWRITE renames can interleave on filesystems
        // that emulate overwrite as delete-then-rename (local FS): the
        // rival's file reappears between our delete and rename. If the
        // rival recorded our step or a NEWER one, its write subsumes
        // ours; otherwise retry — clobbering an OLDER rival write is
        // exactly what Rename.OVERWRITE was asked to do
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          f.delete(tmp, false)
          val landed = try Some(read(f, p).next)
            catch { case _: java.io.IOException => None }
          if (landed.exists(_ >= st.next)) return
          attempts += 1
          require(attempts <= 20, s"atomic state replace kept failing: $p")
          Thread.sleep(2L * attempts)
      }
    }
  }

  /** How long an intent whose merge has NOT landed and whose mtime has
    * stopped advancing may sit before it is treated as a dead drainer's
    * leftover. A LIVE drainer refreshes its intent's mtime from a
    * heartbeat thread (period grace/4) for as long as its step runs, so
    * staleness measures real liveness, not claim age — a slow multi-
    * minute merge is never reaped out from under its owner. The default
    * is generous anyway: a crashed drainer's step is simply adopted by
    * whichever cron fires next, so a long grace delays nothing that a
    * scheduler isn't already delaying. */
  private def claimGraceMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.drain.claimGraceMs")
      .map(_.toLong).getOrElse(30 * 60 * 1000L)

  /** Current state with intent recovery. An intent whose merge landed
    * (crash between the merge commit and the state commit) is promoted.
    * An unlanded intent is NEVER deleted here — it may belong to a
    * concurrent drainer mid-merge (which heartbeats it), and a dead
    * drainer's stale claim must be adopted VERBATIM via [[staleClaim]]
    * so the replacement runs the same step (same batchId, same version
    * range): recomputing a wider range under the same batchId would be
    * silently skipped by the output's replay guard — a data skip. */
  def load(spark: SparkSession, dir: String, appliedBatchId: Long): St =
    loadRecovering(spark, dir, appliedBatchId)._1

  /** [[load]] that additionally reports a just-promoted crashed step as
    * `(base, step)`: the merge landed (batchId `step.next - 1`) but the
    * POST-merge passes of the step body — delete propagation, the
    * non-owning downgrade, the emptied-group check — may not have run
    * before the crash, and once the state is promoted no replay would
    * ever revisit them. The caller must re-run the step body over the
    * window `(base.versions, step.versions]` (the merge replays as a
    * batchId no-op; the passes are idempotent by construction). */
  def loadRecovering(spark: SparkSession, dir: String,
      appliedBatchId: Long): (St, Option[(St, St)]) = {
    val f = fs(spark, dir)
    val state = new Path(dir, "state.properties")
    val intent = new Path(dir, "intent.properties")
    // A rival promoting this intent deletes it between our exists and
    // read (FileNotFoundException -> no intent, fall through to the
    // freshly promoted state); a torn sidecar mid-rename throws
    // ChecksumException, which IS an IOException — retry it out like
    // every other read here instead of crashing the drainer.
    def readIntent(tries: Int): Option[St] =
      try { if (f.exists(intent)) Some(read(f, intent)) else None }
      catch {
        case _: java.io.FileNotFoundException => None
        case _: java.io.IOException if tries > 0 =>
          Thread.sleep(10); readIntent(tries - 1)
        case _: java.io.IOException => None
      }
    readIntent(50) match {
      case Some(i) if appliedBatchId >= i.next - 1 =>
        // the intent's merge ran with batchId = i.next - 1
        def readBase(tries: Int): St = // the step's window start, read BEFORE promotion
          try read(f, state)
          catch {
            case _: java.io.FileNotFoundException => St(Map.empty, 0L)
            case _: java.io.IOException if tries > 0 =>
              Thread.sleep(10); readBase(tries - 1)
            case _: java.io.IOException => St(Map.empty, 0L)
          }
        val base = readBase(50)
        writeAtomic(spark, f, state, i) // state first: never absent
        f.delete(intent, false)
        (i, Some((base, i)))
      case _ =>
        (loadNoIntent(f, state, appliedBatchId), None)
    }
  }

  private def loadNoIntent(f: org.apache.hadoop.fs.FileSystem,
      state: Path, appliedBatchId: Long): St = {
    // A rival's overwrite-rename on an emulating filesystem (local FS
    // deletes then renames) has two transient faces: the state file
    // absent for an instant, or present with a torn checksum sidecar
    // (ChecksumException — an IOException). Both retry; the FIRST
    // attempt is inside the same guard as the loop (the unguarded
    // first read was the r9 EpochDrainSpec flake).
    var sawFile = false
    def attempt(): Option[St] =
      try {
        if (f.exists(state)) { sawFile = true; Some(read(f, state)) }
        else None
      } catch { case _: java.io.IOException => None }
    var out = attempt()
    if (out.isEmpty && (sawFile || appliedBatchId >= 0)) {
      // merges HAVE landed (or the file was just seen), so the miss is
      // transient. Wait it out rather than reporting a fresh pipeline —
      // that misread trips the caller's history check and would restart
      // drain accounting from zero.
      var tries = 0
      while (out.isEmpty && tries < 50) {
        Thread.sleep(10)
        out = attempt()
        tries += 1
      }
    }
    out.getOrElse(St(Map.empty, 0L))
  }

  /** The current intent iff its merge has not landed and its mtime is
    * past the claim grace — a dead drainer's abandoned step. The caller
    * adopts it by re-running EXACTLY this step (batchId `next - 1`,
    * target versions `versions`; the base is the current state, which
    * cannot have moved while the intent exists) and then committing it
    * as its own claim. Replaying work the dead drainer already merged
    * is a batchId no-op. */
  def staleClaim(spark: SparkSession, dir: String, appliedBatchId: Long): Option[St] = {
    val f = fs(spark, dir)
    val intent = new Path(dir, "intent.properties")
    try {
      val status = f.getFileStatus(intent)
      val i = read(f, intent)
      if (appliedBatchId >= i.next - 1) None // landed: load() promotes it
      else if (System.currentTimeMillis() - status.getModificationTime >
        claimGraceMs(spark)) Some(i)
      else None
    } catch {
      case _: java.io.FileNotFoundException => None
      // torn read mid-rival-promotion: no stale claim this cron tick
      case _: java.io.IOException => None
    }
  }

  /** Keeps the caller's claim alive while a long merge runs: a daemon
    * thread refreshes the intent file's mtime every grace/4 until
    * closed. Failures are ignored (the file may legitimately be gone
    * after commit). */
  def heartbeat(spark: SparkSession, dir: String): AutoCloseable = {
    val f = fs(spark, dir)
    val intent = new Path(dir, "intent.properties")
    val period = math.max(claimGraceMs(spark) / 4, 250L)
    val stop = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      while (!stop.await(period, java.util.concurrent.TimeUnit.MILLISECONDS)) {
        try f.setTimes(intent, System.currentTimeMillis(), -1)
        catch { case _: Exception => () }
      }
    }, "graft-drain-heartbeat")
    t.setDaemon(true)
    t.start()
    () => { stop.countDown(); t.join(2000) }
  }

  /** Atomically claims the drain step `post` by create-if-absent
    * publication of the intent file (the same [[graft.store.AtomicClaim]]
    * arbiter commit files use): exactly one concurrent drainer wins a
    * step; a loser re-loads and waits for the winner's commit
    * (multi-drainer arbitration, SURVEY §6h-2). */
  def beginClaim(spark: SparkSession, dir: String, post: St): Boolean = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir))
    val intent = new Path(dir, "intent.properties")
    if (f.exists(intent)) return false // cheap pre-check; claim still arbitrates
    val tmp = new Path(dir,
      s".intent.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    write(f, tmp, post)
    graft.store.AtomicClaim.publish(f, tmp, intent)
  }

  /** Single-writer begin (tests and tools): overwrites any intent. */
  def begin(spark: SparkSession, dir: String, post: St): Unit = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir))
    write(f, new Path(dir, "intent.properties"), post)
  }

  /** Refuses a checkpointed streaming start over a drained stage — the
    * streaming run's early batchIds would be marker-skipped even when
    * they cover commits the drain never saw. */
  def requireNone(spark: SparkSession, dir: String, stage: String): Unit = {
    val f = fs(spark, dir)
    require(!f.exists(new Path(dir, "state.properties")),
      s"stage $stage was drained with runIncremental; a checkpointed " +
        "streaming run would silently skip overlapping batches - keep " +
        "using runIncremental for this pipeline")
  }

  /** Source tables deduped by path (a self-join lists its table twice). */
  def distinctTables(ts: Seq[graft.store.KeyedTable]): Seq[graft.store.KeyedTable] =
    ts.groupBy(_.path).values.map(_.head).toSeq

  /** Per-table target versions for the next drain sub-batch: with no
    * byte budget, drain straight to `cur`; with one, each table
    * advances as far as its pending cdf bytes fit (always ≥ 1 commit —
    * progress even for a single oversized commit). */
  def nextStep(tables: Seq[graft.store.KeyedTable], versions: Map[String, Long],
      cur: Map[String, Long], budget: Option[Long]): Map[String, Long] =
    budget match {
      case None => cur
      case Some(b) => tables.map { t =>
        val after = versions.getOrElse(t.path, -1L)
        val ceil = cur.getOrElse(t.path, t.latestVersion)
        t.path -> (if (after >= ceil) after
                   else t.cdfVersionUpTo(after, b, ceil))
      }.toMap
    }

  /** Promotes `claimed` to the drained state — but ONLY if this drainer
    * still owns the claim (the live intent's content equals `claimed`).
    * Blind promotion was an ownership race: a reaped-and-re-claimed
    * intent belonging to a rival mid-merge would be marked drained
    * before its merge ran. If the claim is gone, the promotion is
    * accepted only when a rival already landed this step or a later one
    * (state.next >= claimed.next — the step adoption path makes rival
    * content identical); anything else is a real anomaly and fails
    * loudly rather than corrupting drain history. */
  def commit(spark: SparkSession, dir: String, claimed: St): Unit = {
    preStateCommitHook(dir)
    val f = fs(spark, dir)
    val state = new Path(dir, "state.properties")
    val intent = new Path(dir, "intent.properties")
    // Same emulated-rename windows as load(): the intent can be
    // transiently unreadable (torn sidecar -> ChecksumException) while
    // a rival reaps-and-republishes. Retry before concluding the claim
    // is gone — a misread here would trip the loud lost-claim require
    // below on a claim this drainer still owns.
    def readIntent(tries: Int): Option[St] =
      try Some(read(f, intent))
      catch {
        case _: java.io.FileNotFoundException => None
        case _: java.io.IOException if tries > 0 =>
          Thread.sleep(10); readIntent(tries - 1)
        case _: java.io.IOException => None
      }
    val cur = readIntent(50)
    if (cur.contains(claimed)) {
      writeAtomic(spark, f, state, claimed) // state first: never absent
      f.delete(intent, false)
    } else {
      // retry transient absence: a rival's overwrite-rename may be
      // mid-window (same emulated-rename hole load() tolerates)
      def landedNext(tries: Int): Long =
        try read(f, state).next
        catch {
          case _: java.io.IOException if tries > 0 =>
            Thread.sleep(10); landedNext(tries - 1)
          case _: java.io.FileNotFoundException => Long.MinValue
        }
      val landed = landedNext(50)
      require(landed >= claimed.next,
        s"drain claim for step ${claimed.next - 1} at $dir was lost " +
          s"(intent=${cur.map(_.next)}, state.next=$landed); the merge " +
          "landed but the step cannot be recorded - raise " +
          "spark.graft.drain.claimGraceMs above the longest step duration")
    }
  }
}
