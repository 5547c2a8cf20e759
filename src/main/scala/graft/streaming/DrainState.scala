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

  /** How long an intent whose merge has NOT landed may sit before it is
    * treated as a dead drainer's leftover and reaped. A reap can only
    * duplicate work, never effects: the step's merge is batchId-guarded
    * (and OCC-arbitrated) in the output table. The default is generous
    * on purpose — a live drain step at scale runs for minutes, and a
    * premature reap costs a duplicate merge attempt plus OCC contention
    * (safe but wasteful); a crashed drainer's step is simply re-run by
    * whichever cron fires next, so a long grace delays nothing that a
    * scheduler isn't already delaying. */
  private def claimGraceMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.drain.claimGraceMs")
      .map(_.toLong).getOrElse(10 * 60 * 1000L)

  /** Current state with intent recovery. An intent whose merge landed
    * (commit crashed mid-promotion) is promoted; an unlanded intent is
    * left alone while fresh — it may belong to a CONCURRENT drainer mid-
    * merge — and reaped once stale past the claim grace period. */
  def load(spark: SparkSession, dir: String, appliedBatchId: Long): St = {
    val f = fs(spark, dir)
    val state = new Path(dir, "state.properties")
    val intent = new Path(dir, "intent.properties")
    if (f.exists(intent)) {
      val i = read(f, intent)
      // the intent's merge ran with batchId = i.next - 1
      if (appliedBatchId >= i.next - 1) {
        f.delete(intent, false)
        write(f, state, i)
        return i
      }
      val st = try f.getFileStatus(intent) catch { case _: java.io.FileNotFoundException => null }
      if (st != null &&
          System.currentTimeMillis() - st.getModificationTime > claimGraceMs(spark))
        f.delete(intent, false)
    }
    if (f.exists(state)) read(f, state) else St(Map.empty, 0L)
  }

  /** Atomically claims the drain step `post` by create-if-absent rename
    * of the intent file (the same arbiter commit files use): exactly one
    * concurrent drainer wins a step; a loser re-loads and waits for the
    * winner's commit (multi-drainer arbitration, SURVEY §6h-2). */
  def beginClaim(spark: SparkSession, dir: String, post: St): Boolean = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir))
    val intent = new Path(dir, "intent.properties")
    if (f.exists(intent)) return false // cheap pre-check; rename still arbitrates
    val tmp = new Path(dir,
      s".intent.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    write(f, tmp, post)
    val won = f.rename(tmp, intent)
    if (!won) f.delete(tmp, false)
    won
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

  def commit(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val state = new Path(dir, "state.properties")
    val intent = new Path(dir, "intent.properties")
    f.delete(state, false)
    f.rename(intent, state)
  }
}
