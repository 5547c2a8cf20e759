package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.store.{KeyedTable, MergeSpec}

/** `stream.groupBy(cols)` awaiting `.agg(...)` (aggs.py:144-166). */
final class AggBuilder(src: Stream, groupCols: Seq[String]) {
  def agg(first: Column, rest: Column*): StreamAgg =
    new StreamAgg(src, groupCols, first +: rest, Map.empty)
}

/** Custom merge arithmetic for one output column — the reference's
  * `.reduce(column, update, delta_update, insert)` (aggs.py:100-110).
  * Expressions reference `u.<c>` (target) / `s.<c>` (staged delta) for
  * update/insert, and `p.<c>` (plus) / `m.<c>` (minus) for the delta.
  */
final case class ReduceSpec(
    update: Option[Column] = None,
    delta: Option[Column] = None,
    insert: Option[Column] = None)

/** An incremental groupBy().agg() stage over a CDF stream.
  *
  * Algorithm per microbatch (aggs.py:44-59): partial-aggregate the
  * post-image rows (`p`) and the pre-image rows (`m`) separately, full
  * outer join them per group, emit delta `coalesce(p,0) - m` per agg
  * column, and merge `u + delta` into the running agg table. Only the
  * microbatch is ever shuffled; the agg table merge is bucket-local.
  */
final class StreamAgg(
    src: Stream,
    groupCols: Seq[String],
    aggCols: Seq[Column],
    reduces: Map[String, ReduceSpec],
    partitionCols: Seq[PartitionCol] = Nil) {

  private def spark = src.spark

  def reduce(column: String, update: Column = null,
      deltaUpdate: Column = null, insert: Column = null): StreamAgg =
    new StreamAgg(src, groupCols, aggCols, reduces + (column ->
      ReduceSpec(Option(update), Option(deltaUpdate), Option(insert))), partitionCols)

  /** Output-table partitioning for the agg table (aggs.py:96-98);
    * columns must be group keys. `prune(...)` narrows merge scans. */
  def partitionBy(cols: PartitionCol*): StreamAgg = {
    require(cols.forall(c => groupCols.contains(c.name)),
      "agg partition columns must be group columns")
    new StreamAgg(src, groupCols, aggCols, reduces, cols)
  }

  /** Batch fixpoint of this aggregation — schema + equivalence checks
    * (aggs.py:63-65). */
  def staticAgged(): DataFrame =
    src.static().groupBy(groupCols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)

  private def aggOutCols: Seq[String] = staticAgged().columns.toSeq.drop(groupCols.size)

  /** The aggregation's plain row-count column (an unfiltered,
    * non-distinct COUNT over a non-null literal — count(lit(1)) /
    * count(*)), if the user declared one and didn't override its
    * arithmetic: it tracks exactly how many source rows a group holds,
    * which is what lets retracting batches detect EMPTIED groups.
    * Without one the stage maintains a hidden internal count column. */
  private lazy val rowCountCol: Option[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
    staticAgged().queryExecution.analyzed.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.collectFirst {
          case Alias(ae: AggregateExpression, name)
              if !ae.isDistinct && ae.filter.isEmpty &&
                !reduces.contains(name) &&
                (ae.aggregateFunction match {
                  case Count(children) => children.nonEmpty && children.forall {
                    case l: Literal => l.value != null
                    case _ => false
                  }
                  case _ => false
                }) => name
        }
    }.flatten.headOption
  }

  def writeToPath(outPath: String): Pipeline = {
    val (handle, _) = buildStage(outPath)
    new Pipeline(src.upstream :+ handle)
  }

  /** The reference's `writeToTable(name)` for agg stages (aggs.py:112). */
  def writeToTable(catalog: graft.store.TableCatalog, name: String): Pipeline =
    writeToPath(catalog.path(name))

  def join(right: Stream, joinType: String = "inner", stagingPath: String = null): JoinBuilder =
    stagedStream(stagingPath).join(right, joinType)

  def groupBy(cols: String*): AggBuilder = stagedStream(null).groupBy(cols: _*)

  private def stagedStream(stagingPath: String): Stream = {
    val path = Option(stagingPath).getOrElse(
      s"${src.stagingRoot}/_stage_agg_${Integer.toHexString((src.table.path, groupCols, aggOutCols).hashCode())}")
    val (handle, outTable) = buildStage(path)
    // an agg stage's emptied-group removal emits delete change rows —
    // the next stage must keep applying them (engine-auto unless the
    // user already opted the source into deletes)
    val s = Stream.fromKeyedTable(outTable, src.maxFilesPerTrigger)
    (if (src.deletesOn && !src.deletesAuto) s.handleDeletes()
     else s.handleDeletesAuto())
      .withUpstream(src.upstream :+ handle)
  }

  private def buildStage(outPath: String): (StageHandle, KeyedTable) = {
    // when the user's agg list has no plain count(*) column, the stage
    // maintains a HIDDEN one (`__graft_rows`, declared internal on the
    // output table and stripped from every public read): exact
    // emptiness detection must not depend on the user's schema, or
    // emptied groups keep zeroed shell rows the batch fixpoint drops
    val hiddenCnt = "__graft_rows"
    val needHidden = rowCountCol.isEmpty
    val aggColsEff =
      if (needHidden) aggCols :+ count(lit(1)).as(hiddenCnt) else aggCols
    val schemaDf = src.static().groupBy(groupCols.map(col): _*)
      .agg(aggColsEff.head, aggColsEff.tail: _*)
    val out = KeyedTable.create(spark, outPath, schemaDf.schema,
      keys = groupCols, numBuckets = src.table.meta.numBuckets,
      partitionCols = partitionCols.map(_.name),
      prunedCols = partitionCols.filter(_.pruned).map(_.name),
      internalCols = if (needHidden) Seq(hiddenCnt) else Nil)
    val aggNames = aggOutCols ++ (if (needHidden) Seq(hiddenCnt) else Nil)

    // default delta: CASE WHEN m.c IS NOT NULL THEN coalesce(p.c,0)-m.c
    // ELSE p.c END (aggs.py:76), override via .reduce(delta_update=...)
    val deltaExprs: Seq[Column] = aggNames.map { c =>
      reduces.get(c).flatMap(_.delta).getOrElse(
        when(col(s"m.$c").isNotNull, coalesce(col(s"p.$c"), lit(0)) - col(s"m.$c"))
          .otherwise(col(s"p.$c"))).alias(c)
    }
    val updateExprs: Map[String, Column] = aggNames.map { c =>
      c -> reduces.get(c).flatMap(_.update).getOrElse(col(s"u.$c") + col(s"s.$c"))
    }.toMap
    val insertExprs: Map[String, Column] = aggNames.flatMap { c =>
      reduces.get(c).flatMap(_.insert).map(c -> _)
    }.toMap
    val mergeSpec = MergeSpec(
      updateExprs = Some(updateExprs),
      insertExprs = if (insertExprs.isEmpty) None else Some(insertExprs))

    def mergeAgg(batch: DataFrame, batchId: Long): Unit =
      mergeAggKnown(batch, batchId, knownNonEmpty = false)

    def mergeAggKnown(batch: DataFrame, batchId: Long,
        knownNonEmpty: Boolean, noRetractions: Boolean = false): Unit = {
      // pinned (see Lineage): the feed is otherwise re-read for the
      // emptiness probe, the plus/minus aggregates, and the zero-check's
      // retraction-group scan
      val data = graft.store.Lineage.pin(batch)
      // every path out of this body (early return, zero-check probe
      // failure, merge failure) must release the pins — try/finally
      try {
      // empty microbatch: skip the agg+merge plan. The batch drain
      // proves non-emptiness from the commit log and skips this job.
      if (!knownNonEmpty && data.isEmpty) return
      // deletes (present only when the source opted into handleDeletes)
      // retract exactly like update pre-images: their contribution is
      // subtracted from the running aggregate
      val plus = data.where(col("_change_type") =!= "update_preimage" &&
          col("_change_type") =!= "delete")
        .groupBy(groupCols.map(col): _*).agg(aggColsEff.head, aggColsEff.tail: _*)
      // append-only window (the log proves zero preimages/deletes): the
      // minus side is an EMPTY relation — Catalyst's empty-relation
      // propagation then erases the full-outer join and its shuffle
      // from the plan, leaving the plus aggregate alone
      val minus =
        if (noRetractions)
          spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            plus.schema)
        else data.where(col("_change_type") === "update_preimage" ||
            col("_change_type") === "delete")
          .groupBy(groupCols.map(col): _*).agg(aggColsEff.head, aggColsEff.tail: _*)
      val p = plus.alias("p")
      val m = minus.alias("m")
      val keyEq = groupCols.map(k => col(s"p.$k") <=> col(s"m.$k")).reduce(_ && _)
      val deltas0 = p.join(m, keyEq, "full_outer")
        .select(groupCols.map(k => coalesce(col(s"p.$k"), col(s"m.$k")).alias(k)) ++
          deltaExprs: _*)
      // emptied-group removal: a group whose retractions (deletes or
      // moved-away group keys) take its running row count to ZERO has no
      // source rows left — the batch fixpoint has no row for it. The
      // zeroed groups are computed BEFORE the merge (current count +
      // this batch's count delta == 0), their delta rows are withheld,
      // and the group rows are deleted in the SAME fused commit the
      // remaining deltas merge into — atomic, and the group's delete
      // change row carries its last live values (downstream retraction
      // subtracts exactly what the old update-to-zero + delete pair
      // did). Only the batch's RETRACTION groups can empty, so the
      // check is one bucket-pruned point read over that (batch-sized)
      // set, never a table scan. Exactness comes from the user's plain
      // count(*) column when declared, else from the hidden
      // engine-maintained one.
      // groups whose cols are all source pks cannot MOVE (pre/post share
      // the pk), so without deletes in play no group can empty;
      // spark.graft.agg.zeroGroupCheck=false opts out entirely
      val zeroCheck = spark.conf
        .getOption("spark.graft.agg.zeroGroupCheck").forall(_ != "false") &&
        (!groupCols.forall(src.pks.contains) || src.deletesOn)
      // the zero path evaluates deltas more than once — pin it
      // a REPLAYED batch's delta merge is a batchId no-op — which would
      // also skip a fused deletion, so replay detects zeroed groups
      // against the CURRENT (already-merged) state and deletes directly
      val alreadyApplied = batchId >= 0 && batchId <= out.lastAppliedBatchId
      val zeroPath = !noRetractions && zeroCheck
      val deltas =
        if (zeroPath && !alreadyApplied) graft.store.Lineage.pin(deltas0)
        else deltas0
      try {
      val zeroedOpt: Option[DataFrame] =
        if (!zeroPath) None
        else {
          val countCol = rowCountCol.getOrElse(hiddenCnt)
          val mGroups = data.where(col("_change_type") === "update_preimage" ||
              col("_change_type") === "delete")
            .select(groupCols.map(col): _*).distinct()
          val cur = out.snapshotForKeys(mGroups, includeInternal = true)
            .select(groupCols.map(col) :+ col(countCol).alias("__cur"): _*)
          val z =
            if (alreadyApplied) cur.where(col("__cur") === 0)
              .select(groupCols.map(col): _*)
            // RIGHT outer, not inner: a group created AND fully
            // retracted inside this single window (insert then delete,
            // or insert then move-away, of a brand-new group key) is
            // absent from the table — its all-zero delta row must be
            // withheld too, or it merges as a shell row the batch
            // fixpoint has no row for. Absent groups zero-check against
            // an implicit current count of 0; only retraction groups
            // can cancel to zero (a pure-insert group's count delta is
            // positive), and a never-inserted group in the delete set
            // is a no-op for the fused deletion (it removes CURRENT
            // rows only).
            else cur.alias("c").join(deltas.alias("dl"),
                groupCols.map(k => col(s"c.$k") <=> col(s"dl.$k")).reduce(_ && _),
                "right_outer")
              .where(coalesce(col("__cur"), lit(0)) + col(s"dl.$countCol") === 0)
              .select(groupCols.map(k => col(s"dl.$k").alias(k)): _*)
          val zp = graft.store.Lineage.pin(z)
          // the probe job can fail (executor loss) before ownership of
          // zp transfers to the finally below — release on that path
          val zpEmpty =
            try zp.isEmpty
            catch { case t: Throwable => graft.store.Lineage.release(zp); throw t }
          if (zpEmpty) { graft.store.Lineage.release(zp); None } else Some(zp)
        }
      // deltas is groupBy output → key-unique; batchId guards replays
      // (a double-applied delta would double-count the running agg)
      try {
        if (alreadyApplied) zeroedOpt.foreach(z => out.delete(z))
        else zeroedOpt match {
          case None =>
            out.merge(deltas, mergeSpec, uniqueKeys = true, batchId = batchId)
          case Some(z) =>
            val live = deltas.alias("dl").join(z.alias("z"),
                groupCols.map(k => col(s"dl.$k") <=> col(s"z.$k")).reduce(_ && _),
                "left_anti")
              .select(deltas.columns.map(c => col(s"dl.$c").alias(c)).toSeq: _*)
            out.merge(live, mergeSpec, uniqueKeys = true, batchId = batchId,
              deleteKeys = Some(z))
        }
      } finally zeroedOpt.foreach(graft.store.Lineage.release)
      } finally {
        if (zeroPath && !alreadyApplied) graft.store.Lineage.release(deltas)
      }
      } finally graft.store.Lineage.release(data)
    }

    val name = s"agg:${new org.apache.hadoop.fs.Path(outPath).getName}"

    // batch-incremental drain (Pipeline.runIncremental): same mergeAgg
    // body over one plain batch of the pending cdf range. The delta
    // merge is NOT idempotent, so the batchId marker + drain intent
    // recovery carry the exactly-once guarantee here.
    def drainOnce(): Unit = {
      val dir = s"$outPath/_drain"
      val tables = DrainState.distinctTables(src.allTables)
      // byte-budgeted sub-batches like StreamJoin.drainOnce (the delta
      // merge stays exactly-once per sub-batch via its own batchId);
      // claim-arbitrated per step so two racing drainers never
      // double-apply a delta (SURVEY §6h-2)
      val budget = spark.conf.getOption("spark.graft.drain.maxBytes").map(_.toLong)
      var quiet = false
      while (!quiet) {
        val applied = out.lastAppliedBatchId
        // step body over one window — shared by the claimed-run path and
        // crashed-step recovery
        def stepBody(baseVersions: Map[String, Long],
            target: DrainState.St): Unit = {
          val after = (p: String) => baseVersions.getOrElse(p, -1L)
          val upTo = (p: String) => target.versions.getOrElse(p, Long.MaxValue)
          // log-derived window profile: a provably-empty window skips
          // the merge; a provably-non-empty one skips the isEmpty job
          val counts = src.logCounts(after, upTo)
          if (!counts.exists { case (u, d, _, _) => u + d == 0L })
            mergeAggKnown(src.changesBatch(after, upTo), target.next - 1,
              knownNonEmpty = counts.isDefined,
              noRetractions = counts.exists { case (_, d, pre, _) =>
                pre == 0L && (d == 0L || !src.deletesOn) })
        }
        val (st, recovered) = DrainState.loadRecovering(spark, dir, applied)
        // a crashed step whose MERGE landed was just promoted — its
        // post-merge emptied-group check may not have run: replay the
        // full body (the delta merge is a batchId no-op)
        recovered.foreach { case (base, done) => stepBody(base.versions, done) }
        val cur = tables.map(t => t.path -> t.latestVersion).toMap
        if (st.versions == cur) quiet = true
        else {
          require(st.versions.nonEmpty || applied < 0,
            s"stage $name has checkpointed-run history; runIncremental needs " +
              "its own state from the pipeline's first run")
          val step = DrainState.nextStep(tables, st.versions, cur, budget)
          // claimed-step runner: heartbeat keeps the claim alive for the
          // merge's duration; commit is ownership-verified (DrainState)
          def run(target: DrainState.St): Unit = {
            val hb = DrainState.heartbeat(spark, dir)
            try stepBody(st.versions, target)
            finally hb.close()
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
      // mirror of drainOnce's mode-mix guard (see StreamJoin)
      DrainState.requireNone(spark, s"$outPath/_drain", name)
      var w = src.changeStream.writeStream
        .option("checkpointLocation", s"$outPath/_cp")
        .queryName(wc.queryName.getOrElse(name))
        .foreachBatch(mergeAgg _)
      wc.options.foreach { case (k, v) => w = w.option(k, v) }
      wc.trigger.foreach(t => w = w.trigger(t))
      w.start()
    }, drainFn = () => drainOnce())
    (handle, out)
  }
}
