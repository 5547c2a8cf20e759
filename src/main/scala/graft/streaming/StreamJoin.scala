package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.store.{KeyedTable, MergeSpec}

/** `left.join(right, type)` before a condition is given
  * (joins.py:145-201).
  */
final class JoinBuilder(left: Stream, right: Stream, joinType: String) {
  require(Seq("inner", "left", "right").contains(joinType),
    s"$joinType join type is not supported") // joins.py:326

  /** Arbitrary join condition over the two sides (joins.py:172-181). */
  def on(expr: (DataFrame, DataFrame) => Column): JoinedStream =
    new JoinedStream(left, right, joinType, expr, Nil)

  /** Equi-join on same-named key columns; the duplicate key column from
    * the non-driving side is dropped (joins.py:183-201). */
  def onKeys(keys: String*): JoinedStream = {
    val expr = (l: DataFrame, r: DataFrame) =>
      keys.map(k => l(k) === r(k)).reduce(_ && _)
    val dropSide = if (joinType == "right") "left" else "right"
    new JoinedStream(left, right, joinType, expr,
      Seq(ProjOp.DropKeys(keys, dropSide)))
  }
}

/** A partition column for a join-output table; wrap with [[prune]] for
  * static merge-time pruning (streams.py:67-94), or declare it
  * GENERATED with [[gen]].
  */
final case class PartitionCol(name: String, pruned: Boolean = false,
    genSql: Option[String] = None)

object prune {
  /** `partitionBy(prune("date"))` — the reference's `prune(col)`. */
  def apply(name: String): PartitionCol = PartitionCol(name, pruned = true)
}

object gen {
  /** `partitionBy(gen("date", "year(ts)*100+month(ts)"))` — the
    * reference's `generated_columns_ddl` (joins.py:875-878): the
    * column need not exist in the join output; the store derives it
    * from each staged batch at merge time (Delta's GENERATED ALWAYS AS
    * analog), so writers never re-derive the partition value and
    * pruning still applies. */
  def apply(name: String, sql: String, pruned: Boolean = true): PartitionCol =
    PartitionCol(name, pruned, Some(sql))
}

/** Projection steps applied to each microbatch join result in order —
  * the reference's transformFunc chain (joins.py:507-525, 929-934).
  */
sealed trait ProjOp
object ProjOp {
  final case class DropKeys(keys: Seq[String], side: String) extends ProjOp
  final case class DropSel(sel: ColumnSel) extends ProjOp
  final case class SelectNames(names: Seq[String]) extends ProjOp
  final case class SelectStar(sels: Seq[ColumnSel]) extends ProjOp
  final case class SelectSels(sels: Seq[ColumnSel]) extends ProjOp
  final case class MapFn(f: DataFrame => DataFrame) extends ProjOp
}

/** A fully-specified incremental 2-way join stage. Terminal ops:
  * `writeToPath` (produces a Pipeline), or chain `join`/`groupBy`
  * (stages this join into an intermediate KeyedTable first, like
  * joins.py:812-873).
  */
/** A drain step's microbatch profile, derived from the source tables'
  * commit-log counts: per-side upsert/delete row counts over the window
  * and the static pin versions (the window's end per primary table).
  * Lets the batch drain skip the per-microbatch pin/count job. */
private[streaming] final case class DrainMeta(
    lUp: Long, lDel: Long, rUp: Long, rDel: Long, lPin: Long, rPin: Long,
    lCommits: Int = -1, rCommits: Int = -1,
    lPre: Long = -1L, rPre: Long = -1L)

final class JoinedStream(
    val left: Stream,
    val right: Stream,
    val joinType: String,
    joinExpr: (DataFrame, DataFrame) => Column,
    projOps: Seq[ProjOp],
    partitionCols: Seq[PartitionCol] = Nil) {

  private def spark = left.spark

  def select(names: String*): JoinedStream =
    withOp(ProjOp.SelectNames(names))

  /** An explicit selector list — each `stream("col")` may carry `.to`
    * transforms and `.alias` renames, anywhere in the list (the
    * reference accepts transformed ColumnSelectors in any select
    * position, joins.py:62-110, 954-963). */
  def select(first: ColumnSel, rest: ColumnSel*): JoinedStream =
    withOp(ProjOp.SelectSels(first +: rest))

  /** The reference's `select('*', stream['col'].alias(...))` form
    * (joins.py:572-620): all joined columns plus transformed extras. */
  def selectStar(sels: ColumnSel*): JoinedStream =
    withOp(ProjOp.SelectStar(sels))

  def drop(sel: ColumnSel): JoinedStream =
    withOp(ProjOp.DropSel(sel))

  def to(f: DataFrame => DataFrame): JoinedStream =
    withOp(ProjOp.MapFn(f))

  /** Output-table partition columns; `prune("c")` additionally narrows
    * each merge's target scan to the batch's values (joins.py:619-632). */
  def partitionBy(cols: PartitionCol*): JoinedStream =
    new JoinedStream(left, right, joinType, joinExpr, projOps, cols)

  private def withOp(op: ProjOp) =
    new JoinedStream(left, right, joinType, joinExpr, projOps :+ op, partitionCols)

  /** Applies the projection chain to a just-joined frame, where `l`/`r`
    * are the two frames that produced it. */
  private def project(joined: DataFrame, l: DataFrame, r: DataFrame): DataFrame =
    projOps.foldLeft(joined) { (df, op) =>
      op match {
        case ProjOp.DropKeys(keys, side) =>
          val src = if (side == "left") l else r
          keys.foldLeft(df)((d, k) => d.drop(src(k)))
        case ProjOp.DropSel(sel) =>
          val src = if (sel.owner eq left) l else r
          df.drop(src(sel.name))
        case ProjOp.SelectNames(names) => df.select(names.map(col): _*)
        case ProjOp.SelectSels(sels) =>
          df.select(sels.map { s =>
            // a selector owned by a stream STAGED into this chain (not
            // one of the two immediate sides) resolves by name on the
            // joined frame, like the reference's selector mapping
            val base =
              if (s.owner eq left) l(s.name)
              else if (s.owner eq right) r(s.name)
              else df(s.name)
            s(base)
          }: _*)
        case ProjOp.SelectStar(sels) =>
          df.select(col("*") +: sels.map { s =>
            val src = if (s.owner eq left) l else r
            s(src(s.name))
          }: _*)
        case ProjOp.MapFn(f) => f(df)
      }
    }

  /** Output primary keys split into (non-nullable, nullable) by join
    * type (joins.py:804-810), restricted to columns that survive the
    * projection. A key that is already nullable UPSTREAM (the outer
    * side of a previous staged join) stays nullable here regardless of
    * this stage's join type — its null rows flow through any join on
    * the other keys, and bucketing on it would break placeholder
    * matching in the chained stage's merge. */
  private[streaming] def outKeySplit: (Seq[String], Seq[String]) = {
    val outCols = staticJoined().columns.toSeq
    val lp = left.pks.filter(outCols.contains)
    val rp = right.pks.filter(outCols.contains)
    val upNullable = (left.nullablePks ++ right.nullablePks).toSet
    val (nn0, nul0) = joinType match {
      case "left"  => (lp, rp.filterNot(lp.contains))
      case "right" => (rp, lp.filterNot(rp.contains))
      case _       => ((lp ++ rp).distinct, Nil)
    }
    val nn = nn0.filterNot(upNullable.contains)
    (nn, (nn0.filter(upNullable.contains) ++ nul0).distinct)
  }

  /** The join applied to full static snapshots — used for output schema
    * and for batch-equivalence checks (joins.py:640-645). */
  def staticJoined(): DataFrame = {
    val ls = left.static()
    val rs = right.static()
    project(ls.join(rs, joinExpr(ls, rs), joinType), ls, rs)
  }

  def writeToPath(outPath: String): Pipeline = {
    val (stageHandle, _) = buildStage(outPath)
    new Pipeline(left.upstream ++ right.upstream :+ stageHandle)
  }

  /** The reference's `writeToTable(name)` (joins.py:748-754): the
    * output table is created under the catalog's warehouse and queryable
    * by name (and via `spark.sql` after `catalog.registerView`). */
  def writeToTable(catalog: graft.store.TableCatalog, name: String): Pipeline =
    writeToPath(catalog.path(name))

  /** User-supplied microbatch sink: receives the combined, deduplicated
    * join delta of every microbatch instead of merging into a managed
    * output table — the reference's `.foreachBatch(mergeFunc)`
    * (joins.py:536-554). Checkpoint goes under `checkpointPath`. */
  def foreachBatch(checkpointPath: String)(fn: (DataFrame, Long) => Unit): Pipeline = {
    val (stageHandle, _) = buildStage(checkpointPath, Some(fn))
    new Pipeline(left.upstream ++ right.upstream :+ stageHandle)
  }

  /** Stages this join into an intermediate table and continues with
    * another join (joins.py:867-869). */
  def join(next: Stream, nextType: String = "inner", stagingPath: String = null): JoinBuilder =
    stagedStream(stagingPath).join(next, nextType)

  /** Stages this join and continues with a groupBy (joins.py:871-873). */
  def groupBy(cols: String*): AggBuilder = stagedStream(null).groupBy(cols: _*)

  def groupByStaged(stagingPath: String, cols: String*): AggBuilder =
    stagedStream(stagingPath).groupBy(cols: _*)

  private def stagedStream(stagingPath: String): Stream = {
    val path = Option(stagingPath).getOrElse(
      s"${left.stagingRoot}/_stage_join_${Integer.toHexString(stageFingerprint)}")
    val (handle, outTable) = buildStage(path)
    Stream.fromKeyedTable(outTable(), left.maxFilesPerTrigger)
      // retractions emitted by this stage must keep retracting downstream
      .handleDeletes(left.deletesOn || right.deletesOn)
      .withUpstream(left.upstream ++ right.upstream :+ handle)
  }

  private def stageFingerprint: Int =
    (left.table.path, right.table.path, joinType, projOps.size,
      left.upstream.size + right.upstream.size).hashCode()

  /** Builds the output KeyedTable + the streaming stage writing it; a
    * `userSink` replaces the managed-table merge with a user fn. */
  private def buildStage(outPath: String,
      userSink: Option[(DataFrame, Long) => Unit] = None): (StageHandle, () => KeyedTable) = {
    val schemaDf = staticJoined()
    val (nonNull, nullable) = outKeySplit
    require(nonNull.nonEmpty, "join output needs at least one non-nullable primary key")
    val anyDeletes = left.deletesOn || right.deletesOn
    require(!anyDeletes || joinType == "inner",
      "handleDeletes is supported for inner joins (an outer join would " +
        "need placeholder downgrades, which the output table cannot express yet)")
    if (anyDeletes) {
      val outCols = schemaDf.columns.toSeq
      require((left.pks ++ right.pks).forall(outCols.contains),
        "handleDeletes needs both sides' primary keys in the join output")
    }
    val seqCols = (left.seqCols ++ right.seqCols).distinct
      .filter(schemaDf.columns.contains)
    lazy val out = KeyedTable.create(spark, outPath, schemaDf.schema,
      keys = nonNull ++ nullable, seqCols = seqCols, nullableKeys = nullable,
      numBuckets = math.max(left.table.meta.numBuckets, right.table.meta.numBuckets),
      partitionCols = partitionCols.map(_.name),
      prunedCols = partitionCols.filter(_.pruned).map(_.name),
      generatedCols = partitionCols.flatMap(pc => pc.genSql.map(pc.name -> _)))
    if (userSink.isEmpty) out // force managed-table creation eagerly

    // state for consistent static pinning across microbatches (joins.py:399-428)
    var lastLeftVersion: Long = -1L
    var lastRightVersion: Long = -1L
    // lazily-built per-side retraction indexes (out pk-subset → full key);
    // cached so repeated deleting batches skip the open-time recovery scan
    val retractIdx = scala.collection.mutable.Map.empty[String, KeyedTable]

    // equality column pairs (leftName, rightName) of the join condition,
    // recovered from the Catalyst expression: conjunct EqualTo over bare
    // attributes of the two frames. Non-equi/OR/cast conjuncts simply
    // contribute no pairs — callers treat missing coverage as "cannot
    // prune", never as an error.
    def equiPairs(lDf: DataFrame, rDf: DataFrame): Seq[(String, String)] = {
      import org.apache.spark.sql.catalyst.expressions.{
        And, AttributeReference, EqualTo, Expression}
      import org.apache.spark.sql.catalyst.plans.logical.Join
      // resolve the condition by analyzing the join itself (a plan-only
      // operation): Spark 4 Columns are lazy nodes, so the raw condition
      // carries no resolved attributes to inspect
      val analyzed = lDf.join(rDf, joinExpr(lDf, rDf), "inner")
        .queryExecution.analyzed
      val lAttrs = lDf.queryExecution.analyzed.output.map(a => a.exprId -> a.name).toMap
      val rAttrs = rDf.queryExecution.analyzed.output.map(a => a.exprId -> a.name).toMap
      def conj(e: Expression): Seq[Expression] = e match {
        case And(a, b) => conj(a) ++ conj(b)
        case x         => Seq(x)
      }
      analyzed.collectFirst { case Join(_, _, _, Some(c), _) => c }
        .toSeq.flatMap(conj).collect {
          case EqualTo(a: AttributeReference, b: AttributeReference)
              if lAttrs.contains(a.exprId) && rAttrs.contains(b.exprId) =>
            lAttrs(a.exprId) -> rAttrs(b.exprId)
          case EqualTo(a: AttributeReference, b: AttributeReference)
              if rAttrs.contains(a.exprId) && lAttrs.contains(b.exprId) =>
            lAttrs(b.exprId) -> rAttrs(a.exprId)
        }
    }

    // column names each side contributes to the join CONDITION (not the
    // projection): an update changing any of them re-pairs the row —
    // the join-key-migration trigger set. Plan-only analysis, computed
    // once per stage.
    lazy val sideCondCols: (Seq[String], Seq[String]) = {
      import org.apache.spark.sql.catalyst.expressions.AttributeReference
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val lDf = left.static()
      val rDf = right.static()
      val analyzed = lDf.join(rDf, joinExpr(lDf, rDf), "inner")
        .queryExecution.analyzed
      val lAttrs = lDf.queryExecution.analyzed.output.map(a => a.exprId -> a.name).toMap
      val rAttrs = rDf.queryExecution.analyzed.output.map(a => a.exprId -> a.name).toMap
      val refs = analyzed.collectFirst { case Join(_, _, _, Some(c), _) => c }
        .toSeq.flatMap(_.collect { case a: AttributeReference => a })
      (refs.flatMap(a => lAttrs.get(a.exprId)).distinct,
        refs.flatMap(a => rAttrs.get(a.exprId)).distinct)
    }

    /** Bucket-pruned static side for one join half. The full static
      * scan per microbatch is THE scale bottleneck of delta-joins — at
      * 100 TB each commit would re-read the whole static table. When
      * the static stream is a plain table (no transform/union), the
      * probe batch is small (row count already known from the log or
      * the pin aggregate — no extra job), the table is big enough to
      * beat the pruning job's overhead, and the join's equality pairs
      * cover the table's bucket keys, the scan is swapped for
      * [[KeyedTable.snapshotForKeys]]: hash the probe keys, read only
      * the files whose manifest hash range can match (version-pinned).
      * Pruned-out rows can never satisfy the equality conjuncts, so
      * inner/left/right halves are unaffected. */
    def prunedStatic(static: Stream, pin: Long, probe: DataFrame,
        probeRows: Long, full: DataFrame, staticIsLeft: Boolean): DataFrame = {
      val conf = spark.conf
      val minBytes = conf.getOption("spark.graft.join.staticPrune.minBytes")
        .map(_.toLong).getOrElse(256L << 20)
      val maxKeys = conf.getOption("spark.graft.join.staticPrune.maxKeys")
        .map(_.toLong).getOrElse(1L << 20)
      if (!static.isPlainTable || probeRows <= 0 || probeRows > maxKeys ||
          static.table.liveManifestBytes < minBytes) full
      else {
        val pairs =
          if (staticIsLeft) equiPairs(full, probe).map(_.swap)
          else equiPairs(probe, full)
        // probe column per static bucket key (first pair wins on dups)
        val byStaticCol = pairs.groupBy(_._2).map { case (s, ps) => s -> ps.head._1 }
        val bk = static.table.meta.bucketKeys
        if (!bk.forall(byStaticCol.contains)) full
        else {
          spark.sparkContext.setJobDescription("graft:join:prune")
          try static.table.snapshotForKeys(
            probe.select(bk.map(k => col(byStaticCol(k)).alias(k)): _*), pin)
          finally spark.sparkContext.setJobDescription(null)
        }
      }
    }

    def mergeJoin(batch: DataFrame, batchId: Long): Unit =
      mergeJoinMeta(batch, batchId, None)

    def mergeJoinMeta(batch: DataFrame, batchId: Long,
        drain: Option[DrainMeta]): Unit = {
      val lRows = batch
        .where(col("l").isNotNull && col("l._change_type") =!= "update_preimage" &&
          col("l._change_type") =!= "delete")
        .select("l.*")
      val rRows = batch
        .where(col("r").isNotNull && col("r._change_type") =!= "update_preimage" &&
          col("r._change_type") =!= "delete")
        .select("r.*")
      // microbatch profile: version pins, upsert and delete counts per
      // side. The batch drain derives all of it from the commit log's
      // recorded per-commit counts (DrainMeta — no job at all); the
      // streaming path runs ONE aggregate action over the feed (the
      // reference unions two aggs for the same reason, joins.py:403-408)
      val (n, lDeleted, rDeleted, lCnt, rCnt, lMax, rMax, lPre, rPre) = drain match {
        case Some(m) =>
          (m.lUp + m.lDel + m.rUp + m.rDel, m.lDel > 0, m.rDel > 0,
            m.lUp, m.rUp, m.lPin, m.rPin, m.lPre, m.rPre)
        case None =>
          batch.sparkSession.sparkContext.setJobDescription("graft:join:pin")
          val upsertish = (side: String) => col(s"$side").isNotNull &&
            col(s"$side._change_type") =!= "update_preimage" &&
            col(s"$side._change_type") =!= "delete"
          val vRow = batch.agg(
            max(col("l._commit_version")).alias("lv"),
            max(col("r._commit_version")).alias("rv"),
            count(lit(1)).alias("n"),
            count(when(col("l._change_type") === "delete", 1)).alias("ld"),
            count(when(col("r._change_type") === "delete", 1)).alias("rd"),
            count(when(upsertish("l"), 1)).alias("lc"),
            count(when(upsertish("r"), 1)).alias("rc"),
            count(when(col("l._change_type") === "update_preimage", 1)).alias("lp"),
            count(when(col("r._change_type") === "update_preimage", 1)).alias("rp"))
            .collect().head
          batch.sparkSession.sparkContext.setJobDescription(null)
          (vRow.getLong(2), vRow.getLong(3) > 0, vRow.getLong(4) > 0,
            vRow.getLong(5), vRow.getLong(6),
            if (vRow.isNullAt(0)) -1L else vRow.getLong(0),
            if (vRow.isNullAt(1)) -1L else vRow.getLong(1),
            vRow.getLong(7), vRow.getLong(8))
      }
      if (sys.env.contains("GRAFT_DEBUG_MERGE"))
        println(s"[mb] batch=$batchId rows=$n lv=$lMax rv=$rMax")
      if (n == 0L) return // empty microbatch: nothing to do
      val (lDeletes, rDeletes) = (lDeleted, rDeleted)
      // pin statics at the batch's max commit version for deterministic
      // reads under lazy evaluation (joins.py:409-428)
      val lPin = if (lMax >= 0) lMax else lastLeftVersion
      val rPin = if (rMax >= 0) rMax else lastRightVersion
      val lStatic = left.static(lPin)
      val rStatic = right.static(rPin)
      lastLeftVersion = lPin
      lastRightVersion = rPin

      def latestPerKey(df: DataFrame, pks: Seq[String], seq: Seq[String]): DataFrame = {
        // take the newest image of each key within the batch
        // (joins.py:388-395, 429-433)
        val ord =
          if (seq.nonEmpty) struct(seq.map(col): _*).desc
          else col("_commit_version").desc
        val w = Window.partitionBy(pks.map(col): _*).orderBy(ord)
        df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
          .drop("__rn", "_change_type", "_commit_version")
      }
      // a single contributing commit's feed is key-unique by
      // construction (each merge writes at most one post-image per full
      // table key), so its within-batch latest-wins window — a shuffle —
      // is a no-op, skipped when the log proves the window is 1 commit.
      // Only when the stream is the plain table (a transform could
      // duplicate rows) keyed exactly by the table's key (a narrower
      // user-declared pk set would still need the dedup).
      def keyUniqueWindow(side: Stream, commits: Int): Boolean =
        commits == 1 && side.isPlainTable && side.pks == side.table.meta.keys
      val lBatch =
        if (drain.exists(m => keyUniqueWindow(left, m.lCommits)))
          lRows.drop("_change_type", "_commit_version")
        else latestPerKey(lRows, left.pks, left.seqCols)
      val rBatch =
        if (drain.exists(m => keyUniqueWindow(right, m.rCommits)))
          rRows.drop("_change_type", "_commit_version")
        else latestPerKey(rRows, right.pks, right.seqCols)

      // each half probes a (small) batch against the other side's
      // static — swap the full static scan for a bucket-pruned point
      // read when the equality keys cover that table's bucket keys
      val rStaticH1 = prunedStatic(right, rPin, lBatch, lCnt, rStatic,
        staticIsLeft = false)
      val lStaticH2 = prunedStatic(left, lPin, rBatch, rCnt, lStatic,
        staticIsLeft = true)
      // half 1: left-batch rows joined to pinned right static (joins.py:310)
      val newLeft = project(
        broadcast(lBatch).join(rStaticH1, joinExpr(lBatch, rStaticH1),
          if (joinType == "left") "left" else "inner"),
        lBatch, rStaticH1)
      // half 2: right-batch rows joined to pinned left static (joins.py:314)
      val newRight = project(
        lStaticH2.join(broadcast(rBatch), joinExpr(lStaticH2, rBatch),
          if (joinType == "right") "right" else "inner"),
        lStaticH2, rBatch)

      // unify rows discovered from both sides in the same batch
      // (joins.py:318-343): full-outer on the output key, coalesce.
      // A microbatch that carries rows from ONE side only — the common
      // case in chained stages, where each wave touches one source —
      // skips the other half AND the full-outer combine entirely
      // (halves the merge plan's jobs; within one half the join output
      // is already key-unique).
      val allKeys = nonNull ++ nullable
      // dynamic, not schemaDf.columns (pinned at buildStage): with
      // spark.graft.schema.autoMerge an EVOLVED source's new columns
      // flow through the join halves here and evolve the output table
      // in merge() — a drain-mode pipeline picks up source schema
      // evolution without a restart (§6f-4; the checkpointed streaming
      // path still needs one — its file source pins schemas at start)
      val outCols = newLeft.columns.toSeq
      val keepKeyed = (df: DataFrame) =>
        df.select(outCols.map(col): _*)
          .where(allKeys.map(k => col(k).isNotNull).reduce(_ || _))
      val combined =
        if (rCnt == 0L && lCnt > 0L) keepKeyed(newLeft)
        else if (lCnt == 0L && rCnt > 0L) keepKeyed(newRight)
        else {
          val a = newLeft.alias("ha")
          val b = newRight.alias("hb")
          val keyEq = allKeys.map(k => col(s"ha.$k") <=> col(s"hb.$k")).reduce(_ && _)
          a.join(b, keyEq, "full_outer")
            .select(outCols.map(c => coalesce(col(s"ha.$c"), col(s"hb.$c")).alias(c)): _*)
            .where(allKeys.map(k => col(k).isNotNull).reduce(_ || _))
        }

      def latestDeleteKeys(side: String, pks: Seq[String]): DataFrame = {
        val all = batch.where(col(side).isNotNull).select(s"$side.*")
        val w = Window.partitionBy(pks.map(col): _*)
          .orderBy(col("_commit_version").desc)
        all.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1 && col("_change_type") === "delete")
          .select(pks.map(col): _*)
      }
      /** Resolves `srcKeys` (one side's pks) to FULL output keys and
        * deletes those rows — the shared machinery of delete
        * propagation and join-key migration. The source keys are
        * resolved through a lazily-built secondary index on that side's
        * pks (A33) — two bucket- and file-pruned reads — so
        * `out.delete` takes the full-key pruned path; a full
        * `out.snapshot()` semi-join per retracting microbatch would
        * read the WHOLE output table (a 100 TB killer). When a side's
        * pks already equal the output's bucket keys the output prunes
        * directly and no index is kept. */
      def retract(srcKeys: DataFrame, pks: Seq[String], idxSubPath: String): Unit = {
        // maintaining the index only pays once the output outgrows a
        // single cheap scan — below the threshold one broadcast
        // semi-join over the (small) table beats building and
        // incrementally syncing a second table per deleting batch
        val idxMinBytes = spark.conf
          .getOption("spark.graft.retract.indexMinBytes")
          .map(_.toLong).getOrElse(256L << 20)
        // snapshotForKeys semi-joins on the output's BUCKET keys only,
        // so it is exact iff pks == bucketKeys; when pks strictly
        // contain them (a chained stage whose upstream-nullable pk is
        // excluded from bucketKeys) the bucket-pruned read still
        // applies but needs a residual semi-join on the FULL pks —
        // without it, rows matching only on bucket keys would be
        // resolved and deleted (over-deletion)
        val bKeys = out.meta.bucketKeys.toSet
        val fullKeys =
          if (bKeys.subsetOf(pks.toSet)) {
            val pruned = out.snapshotForKeys(srcKeys)
            val exact =
              if (bKeys == pks.toSet) pruned
              else pruned.join(broadcast(srcKeys), pks, "left_semi")
            exact.select((nonNull ++ nullable).map(col): _*)
          }
          else if (out.liveManifestBytes < idxMinBytes)
            out.snapshot().join(broadcast(srcKeys), pks, "left_semi")
              .select((nonNull ++ nullable).map(col): _*)
          else {
            val idx = retractIdx.getOrElseUpdate(idxSubPath,
              graft.ops.SecondaryIndex.ensure(
                spark, s"$outPath/_idx/$idxSubPath", out, pks,
                out.meta.numBuckets))
            graft.ops.SecondaryIndex.sync(idx, out)
            graft.ops.SecondaryIndex.lookupKeys(idx, out, srcKeys)
          }
        out.delete(fullKeys)
      }

      // join-key migration (managed outputs): an update that changes
      // any column the join CONDITION reads re-pairs the row. The merge
      // below inserts the NEW pairing under its new output key, so the
      // OLD pairing — a DIFFERENT output key — would survive as a stale
      // row. Moved source keys (window-start preimage differs from
      // window-end image on a condition column) retract like deletes,
      // BEFORE the merge: after it, the key lookup would resolve and
      // delete the fresh rows too. Only the side whose rows OWN output
      // rows in this join type migrates: inner = both; left join = the
      // left side (its old pairings delete and the merge re-inserts the
      // new match or a placeholder), right symmetric. The NON-owning
      // side of an outer join cannot migrate — its old pairings would
      // need placeholder DOWNGRADES the output table cannot express
      // (same standing limitation as A21 delete propagation). The
      // reference never retracts at all — a moved key strands its old
      // row there (joins.py:310-343); incremental == batch recompute
      // requires doing better.
      // spark.graft.join.migrationCheck=false opts out for pipelines
      // whose join-condition columns are immutable by contract (the
      // common schema shape) — saving the per-update-batch detection job
      val migrationCheck = spark.conf
        .getOption("spark.graft.join.migrationCheck").forall(_ != "false")
      if (userSink.isEmpty && migrationCheck) {
        def moved(side: String, pks: Seq[String], seq: Seq[String],
            condCols: Seq[String]): DataFrame = {
          val all = batch.where(col(side).isNotNull).select(s"$side.*")
          // state before the window = the OLDEST preimage per key
          // (feeds only record APPLIED changes, so it equals the
          // watermark-time row); state after = the newest image, the
          // same ordering the merge applies
          val pre = all.where(col("_change_type") === "update_preimage")
            .withColumn("__rn", row_number().over(
              Window.partitionBy(pks.map(col): _*)
                .orderBy(col("_commit_version").asc)))
            .where(col("__rn") === 1)
          val post = latestPerKey(all.where(
            col("_change_type") =!= "update_preimage" &&
              col("_change_type") =!= "delete"), pks, seq)
          pre.alias("p").join(post.alias("q"),
              pks.map(k => col(s"p.$k") <=> col(s"q.$k")).reduce(_ && _))
            .where(condCols.map(c => !(col(s"p.$c") <=> col(s"q.$c"))).reduce(_ || _))
            .select(pks.map(k => col(s"p.$k").alias(k)): _*)
        }
        def migrate(side: String, stream: Stream, condCols: Seq[String],
            idxSubPath: String): Unit = {
          // a condition column inside the side's PRIMARY KEY cannot
          // move (pre/post images share the pk by construction) — sides
          // whose condition columns are all pk columns skip migration
          // statically (e.g. a dimension joined on its own key)
          val movable = condCols.filterNot(stream.pks.contains)
          if (movable.nonEmpty) {
            val mk = moved(side, stream.pks, stream.seqCols, movable)
              .persist(StorageLevel.MEMORY_AND_DISK)
            // one small batch-sized job guards the (rare) retraction
            try if (!mk.isEmpty) retract(mk, stream.pks, idxSubPath)
            finally mk.unpersist()
          }
        }
        val (lCondCols, rCondCols) = sideCondCols
        if (joinType != "right" && lPre != 0L && lCnt > 0L)
          migrate("l", left, lCondCols, "l")
        if (joinType != "left" && rPre != 0L && rCnt > 0L)
          migrate("r", right, rCondCols, "r")
      }

      userSink match {
        case Some(fn) => fn(combined, batchId)
        // combined is outer-merged per output key above → key-unique;
        // batchId makes a replayed microbatch a no-op (exactly-once)
        case None => out.merge(combined, MergeSpec(), uniqueKeys = true,
          batchId = batchId)
      }

      // delete propagation (inner joins): a source key whose LATEST
      // action in this batch is a delete retracts every output row it
      // contributed. Commit versions strictly order delete vs re-insert
      // within the batch. Runs AFTER the merge (the merge never upserts
      // a key whose latest action is a delete, so the fresh rows are
      // safe), through the same [[retract]] machinery as migration.
      if (anyDeletes && userSink.isEmpty) {
        if (left.deletesOn && lDeletes) retract(latestDeleteKeys("l", left.pks), left.pks, "l")
        if (right.deletesOn && rDeletes) retract(latestDeleteKeys("r", right.pks), right.pks, "r")
      }
    }

    def pack(ls: DataFrame, rs: DataFrame): DataFrame = {
      val lStruct = struct(ls.columns.map(col): _*)
      val rStruct = struct(rs.columns.map(col): _*)
      val lPacked = ls.select(lStruct.alias("l"), lit(null).cast(
        org.apache.spark.sql.types.StructType(rs.schema.fields)).alias("r"))
      val rPacked = rs.select(lit(null).cast(
        org.apache.spark.sql.types.StructType(ls.schema.fields)).alias("l"), rStruct.alias("r"))
      lPacked.unionByName(rPacked)
    }
    val packed: DataFrame = pack(left.changeStream, right.changeStream)

    val name = s"join:${new org.apache.hadoop.fs.Path(outPath).getName}"

    // batch-incremental drain (Pipeline.runIncremental): the mergeJoin
    // body over plain batches of the pending cdf range. With
    // spark.graft.drain.maxBytes set, the backlog splits into
    // byte-budgeted sub-batches (per-commit cdf sizes from the commit
    // log) — a month of backlog becomes bounded merges, not one giant
    // one; each sub-batch has its own intent/commit cycle and batchId,
    // so crash recovery and exactly-once work per sub-batch.
    def drainOnce(): Unit = {
      val dir = s"$outPath/_drain"
      val tables = DrainState.distinctTables(left.allTables ++ right.allTables)
      val budget = spark.conf.getOption("spark.graft.drain.maxBytes").map(_.toLong)
      // claim-arbitrated loop (SURVEY §6h-2): state and sources re-load
      // every step, so two racing drainers interleave safely — each step
      // is claimed by intent-file rename, the loser waits for the
      // winner's commit, and a replayed step's merge is a batchId no-op
      var quiet = false
      while (!quiet) {
        val applied = if (userSink.isEmpty) out.lastAppliedBatchId else -1L
        val st = DrainState.load(spark, dir, applied)
        val cur = tables.map(t => t.path -> t.latestVersion).toMap
        if (st.versions == cur) quiet = true
        else {
          require(st.versions.nonEmpty || applied < 0,
            s"stage $name has checkpointed-run history; runIncremental needs " +
              "its own state from the pipeline's first run")
          val step = DrainState.nextStep(tables, st.versions, cur, budget)
          // runs a claimed step under a live heartbeat (so a slow merge
          // is never reaped) and promotes it ownership-verified
          def run(target: DrainState.St): Unit = {
            val after = (p: String) => st.versions.getOrElse(p, -1L)
            val upTo = (p: String) => target.versions.getOrElse(p, Long.MaxValue)
            // log-derived microbatch profile: pins at the window end,
            // counts summed from per-commit records — the pin job is
            // skipped entirely, and an all-layout-commit window (counts
            // 0/0) skips even the merge call
            val meta = for {
              (lu, ld, lp, ln) <- left.logCounts(after, upTo)
              (ru, rd, rp, rn) <- right.logCounts(after, upTo)
            } yield DrainMeta(lu, ld, ru, rd,
              lPin = upTo(left.table.path),
              rPin = upTo(right.table.path),
              lCommits = ln, rCommits = rn,
              lPre = lp, rPre = rp)
            val hb = DrainState.heartbeat(spark, dir)
            try {
              if (!meta.exists(m => m.lUp + m.lDel + m.rUp + m.rDel == 0L))
                mergeJoinMeta(pack(left.changesBatch(after, upTo),
                  right.changesBatch(after, upTo)), target.next - 1, meta)
            } finally hb.close()
            DrainState.commit(spark, dir, target)
          }
          if (DrainState.beginClaim(spark, dir, DrainState.St(step, st.next + 1)))
            run(DrainState.St(step, st.next + 1))
          else DrainState.staleClaim(spark, dir, applied) match {
            // dead drainer: adopt its EXACT step (same batchId + range;
            // already-merged work replays as a batchId no-op)
            case Some(adopted) => run(adopted)
            case None => Thread.sleep(50) // live drainer holds this step
          }
        }
      }
    }

    val handle = StageHandle(name, wc => {
      // the mirror of drainOnce's mode-mix guard: a checkpointed run
      // over a drained stage would have its early batchIds silently
      // marker-skipped even when they cover newer commits
      DrainState.requireNone(spark, s"$outPath/_drain", name)
      var w = packed.writeStream
        .option("checkpointLocation", s"$outPath/_cp")
        .queryName(wc.queryName.getOrElse(name))
        .foreachBatch(mergeJoin _)
      wc.options.foreach { case (k, v) => w = w.option(k, v) }
      wc.trigger.foreach(t => w = w.trigger(t))
      w.start()
    }, drainFn = () => drainOnce())
    (handle, () => out)
  }
}
