package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.store.{KeyedTable, MergeSpec}

import java.nio.file.Files

/** Gate queries that exercise the CDC store end-to-end in batch form:
  * build a KeyedTable in a temp dir, apply real merge commits, return
  * the resulting snapshot. The DuckDB oracle recomputes the expected
  * fixpoint with CASE expressions over the same source table — so the
  * whole upsert/sequence/CDF machinery is hash-checked by the driver,
  * not just spec-tested (SURVEY.md §2 A1, A3).
  */
object CdcQueries {

  private def freshDir(): String =
    Files.createTempDirectory("graft_cdc").toString

  /** Time travel: after an update commit, `snapshot(1)` must still
    * read the ORIGINAL state (bucket-version map replay at v=1). */
  def cdcTimeTravel(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val kt = KeyedTable.create(s, freshDir(), o.schema, keys = Seq("o_orderkey"), numBuckets = 16)
    kt.upsert(o, uniqueKeys = true)
    kt.upsert(o.where(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2.0), uniqueKeys = true)
    kt.snapshot(1)
  }

  /** Batch change-feed read: `changesSince(1)` must contain exactly the
    * second commit's pre/post images. */
  def cdcChangesSince(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val kt = KeyedTable.create(s, freshDir(), o.schema, keys = Seq("o_orderkey"), numBuckets = 16)
    kt.upsert(o, uniqueKeys = true)
    kt.upsert(o.where(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2.0), uniqueKeys = true)
    kt.changesSince(1)
  }

  /** A31: optimistic multi-writer — two INDEPENDENT handles of one
    * table race three merges each from two threads, no coordination.
    * Each writer owns one key parity and its merges are ordered within
    * the thread, so every interleaving converges to the same final
    * state (which the oracle recomputes) — but only if every lost
    * commit claim was detected and correctly replayed. */
  def occMultiWriter(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val path = freshDir()
    val kt = KeyedTable.create(s, path, o.schema, keys = Seq("o_orderkey"), numBuckets = 16)
    kt.upsert(o, uniqueKeys = true)
    def writer(mod: Int): Thread = new Thread {
      override def run(): Unit = {
        val h = KeyedTable.forPath(s, path)
        (1 to 3).foreach { i =>
          h.upsert(o.where(col("o_orderkey") % 2 === mod)
            .withColumn("o_orderstatus", lit(s"W$mod$i"))
            .withColumn("o_totalprice", col("o_totalprice") + (mod * 1000 + i * 10)),
            uniqueKeys = true)
        }
      }
    }
    val (t0, t1) = (writer(0), writer(1))
    t0.start(); t1.start(); t0.join(); t1.join()
    KeyedTable.forPath(s, path).snapshot()
  }

  /** A34: file-granular commit manifests — seed under a tiny
    * `targetFileRows` so every bucket splits into many hash-range
    * files, then two sparse update waves and a delete wave rewrite
    * ONLY the files whose key-hash range intersects each batch,
    * carrying the rest forward by reference. The snapshot then reads
    * carried + rewritten files together; the oracle recomputes the
    * final state, so a manifest that dropped or duplicated any carried
    * file hash-mismatches. */
  def manifestPointMerge(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    s.conf.set("spark.graft.targetFileRows", "500")
    try {
      val kt = KeyedTable.create(s, freshDir(), o.schema, keys = Seq("o_orderkey"), numBuckets = 4)
      kt.upsert(o, uniqueKeys = true)
      kt.upsert(o.where(col("o_orderkey") % 151 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0), uniqueKeys = true)
      kt.upsert(o.where(col("o_orderkey") % 211 === 3)
        .withColumn("o_custkey", col("o_custkey") + 500000L), uniqueKeys = true)
      kt.delete(o.where(col("o_orderkey") % 163 === 1).select("o_orderkey"))
      kt.snapshot()
    } finally s.conf.unset("spark.graft.targetFileRows")
  }

  /** §6t-8 membership probe under the driver oracle: the orders table
    * is built as TWELVE disjoint insert waves with the probe forced on
    * (`matchPruneMinBytes=0`; the staged-fraction guard still skips the
    * earliest waves, so both probe-on and probe-off merges land), then
    * one point-update wave rewrites matched files only. Any file the
    * probe wrongly carries (missed match ⇒ duplicate/stale rows) or
    * wrongly drops (over-prune ⇒ lost rows) hash-mismatches against
    * the recomputed final content. */
  def manifestInsertProbe(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    // file sizing must scale WITH the input: production tables hold a
    // bounded FILE COUNT per bucket (byte-sized files + auto-compact +
    // rebucketing), so the scale-honest gate shape targets ~24
    // files/bucket at every SF — a fixed 500-row size at sf1 would
    // instead model a knob misconfiguration (3,000 tiny files, every
    // wave's fold rewriting the table) and measure that artifact, not
    // the probe. NB with the default autoCompact.maxFiles=16 and gate
    // files far below the fold cap, late waves (≈9+) DO engage the
    // fold back to ~16 files/bucket — deliberate: the gate then also
    // exercises fold rewrites under the probe, and the oracle pins
    // that folded content stays exact
    val n = o.count()
    s.conf.set("spark.graft.targetFileRows", math.max(500L, n / 96).toString)
    s.conf.set("spark.graft.merge.matchPruneMinBytes", "0")
    try {
      val kt = KeyedTable.create(s, freshDir(), o.schema, keys = Seq("o_orderkey"), numBuckets = 4)
      (0 until 12).foreach(i =>
        kt.upsert(o.where(col("o_orderkey") % 12 === i), uniqueKeys = true))
      kt.upsert(o.where(col("o_orderkey") % 97 === 5)
        .withColumn("o_totalprice", col("o_totalprice") * 2), uniqueKeys = true)
      kt.snapshot()
    } finally {
      s.conf.unset("spark.graft.targetFileRows")
      s.conf.unset("spark.graft.merge.matchPruneMinBytes")
    }
  }

  /** A35: manifest zone maps + GraftFileIndex data skipping — optimize
    * clusters files by `o_orderdate`, the commit manifest records each
    * file's per-column [min,max], and the filtered snapshot prunes
    * whole files driver-side before any task launches (Delta's
    * OPTIMIZE + data-skipping loop). The oracle is the plain filter,
    * so a zone map that over-prunes (drops a file holding matching
    * rows) or under-returns hash-mismatches. File-count assertions
    * live in ZoneSkipSpec; this gate hash-checks the VALUES read
    * through the pruned scan. */
  def scanZoneSkip(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_totalprice")
    // timestamps must be written as INT64 micros for footer stats —
    // Spark's default INT96 carries no usable min/max
    s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    s.conf.set("spark.graft.targetFileRows", "2000")
    try {
      val kt = KeyedTable.create(s, freshDir(), o.schema, keys = Seq("o_orderkey"), numBuckets = 4)
      kt.upsert(o, uniqueKeys = true)
      kt.optimize(Seq("o_orderdate"))
      kt.snapshot().where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    } finally {
      s.conf.unset("spark.graft.targetFileRows")
      s.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  /** A40: predicate delete (DELETE WHERE analog) — a retention-style
    * time-range purge on an optimize(date)-clustered table. Zone maps
    * pick the candidate files driver-side; only those are read and
    * rewritten (ZoneSkipSpec asserts the file accounting), and the
    * oracle recomputes the surviving rows, so both over-deletion and
    * under-deletion hash-mismatch. */
  def deleteWhereGate(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_totalprice")
    s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    s.conf.set("spark.graft.targetFileRows", "2000")
    try {
      val kt = KeyedTable.create(s, freshDir(), o.schema, keys = Seq("o_orderkey"), numBuckets = 4)
      kt.upsert(o, uniqueKeys = true)
      kt.optimize(Seq("o_orderdate"))
      kt.deleteWhere(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      kt.snapshot()
    } finally {
      s.conf.unset("spark.graft.targetFileRows")
      s.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  /** Bucket-pruned point reads (reader-side counterpart of merge's
    * affected-bucket pruning): look up a sparse key set; only those
    * keys' buckets are read. Oracle = the plain filter. */
  def keyedLookup(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val kt = KeyedTable.create(s, freshDir(), o.schema, keys = Seq("o_orderkey"), numBuckets = 16)
    kt.upsert(o, uniqueKeys = true)
    kt.snapshotForKeys(o.where(col("o_orderkey") % 150 === 7).select("o_orderkey"))
  }

  /** A33: secondary index as a derived table — non-key lookups via two
    * bucket-pruned reads, index maintained incrementally from the CDF
    * through an update wave (moved values) and a delete wave. Oracle
    * recomputes the final state + filter directly. */
  def indexLookup(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val base = KeyedTable.create(s, freshDir(), o.schema, keys = Seq("o_orderkey"), numBuckets = 16)
    base.upsert(o, uniqueKeys = true)
    val idx = graft.ops.SecondaryIndex.create(s, freshDir(), base, "o_custkey", numBuckets = 16)
    val v0 = base.latestVersion
    base.upsert(o.where(col("o_orderkey") % 100 === 0)
      .withColumn("o_custkey", col("o_custkey") + 100000L), uniqueKeys = true)
    base.delete(o.where(col("o_orderkey") % 97 === 0).select("o_orderkey"))
    graft.ops.SecondaryIndex.refresh(idx, base, v0)
    val values = base.snapshot().select("o_custkey")
      .where(col("o_custkey") % 211 === 5).distinct()
    graft.ops.SecondaryIndex.lookup(idx, base, values)
  }

  /** A1: two upsert commits (inserts, then mixed update+insert batch);
    * snapshot must reflect the latest state of every key. */
  def cdcUpsertSnapshot(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val kt = KeyedTable.create(s, freshDir(), o.schema, keys = Seq("o_orderkey"), numBuckets = 16)
    kt.upsert(o, uniqueKeys = true)
    val updates = o.where(col("o_orderkey") % 3 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    kt.upsert(updates, uniqueKeys = true)
    kt.snapshot()
  }

  /** A3: sequenceBy semantics — a newer sequence value wins, a stale
    * one is rejected, both within and across commits. */
  def cdcSeqLatestWins(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      .withColumn("seq", lit(1L))
    val kt = KeyedTable.create(s, freshDir(), o.schema,
      keys = Seq("o_orderkey"), seqCols = Seq("seq"), numBuckets = 16)
    kt.upsert(o, uniqueKeys = true)
    // newer: doubles the price for keys %5==0
    kt.upsert(o.where(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2.0)
      .withColumn("seq", lit(2L)), uniqueKeys = true)
    // stale: must be rejected entirely
    kt.upsert(o.where(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", lit(-1.0))
      .withColumn("o_orderstatus", lit("STALE"))
      .withColumn("seq", lit(0L)))
    kt.snapshot()
  }

  /** A13 (store half): incremental aggregation by plus-delta merges —
    * three disjoint slices of lineitem merged one at a time into a
    * running (sum, count) agg table must equal the one-shot aggregate. */
  def cdcAggIncremental(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    def slice(i: Int): DataFrame =
      l.where(pmod(col("l_orderkey"), lit(3)) === i)
        .groupBy(col("l_returnflag"))
        .agg(sum("l_quantity").as("total_qty"), count(lit(1)).as("cnt"))
    val schema = slice(0).schema
    val kt = KeyedTable.create(s, freshDir(), schema, keys = Seq("l_returnflag"), numBuckets = 4)
    val spec = MergeSpec(updateExprs = Some(Map(
      "total_qty" -> (col("u.total_qty") + col("s.total_qty")),
      "cnt" -> (col("u.cnt") + col("s.cnt")))))
    (0 until 3).foreach(i => kt.merge(slice(i), spec, uniqueKeys = true))
    kt.snapshot().select(col("l_returnflag"), round(col("total_qty"), 2).as("total_qty"), col("cnt"))
  }

  /** A6/A19 end-to-end: a REAL streaming pipeline (file-source CDF →
    * foreachBatch incremental merge) fed in two batches with the right
    * side arriving late — unmatched placeholders must upgrade in place.
    * The oracle is the plain batch left join. */
  def cdcJoinIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Stream
    val root = freshDir()
    val oDf = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(s, d).select("c_custkey", "c_name")
    val oT = KeyedTable.create(s, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val cT = KeyedTable.create(s, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 8)
    val p = Stream.fromKeyedTable(oT, maxFilesPerTrigger = 64)
      .join(Stream.fromKeyedTable(cT, maxFilesPerTrigger = 64), "left")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
    oT.upsert(oDf.where(col("o_orderkey") % 2 === 0), uniqueKeys = true)
    p.runAvailableNow()
    cT.upsert(cDf, uniqueKeys = true) // late right side: placeholders upgrade
    oT.upsert(oDf.where(col("o_orderkey") % 2 === 1), uniqueKeys = true)
    p.runAvailableNow()
    KeyedTable.forPath(s, s"$root/out").snapshot()
  }

  /** A13/A14 end-to-end: a REAL streaming agg pipeline with a custom
    * `.reduce` maintaining a running average — fed in slices plus an
    * update batch whose pre/post images must cancel correctly. */
  def cdcAggReduceIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Stream
    import org.apache.spark.sql.expressions.Window
    val root = freshDir()
    // (l_orderkey, l_linenumber) is NOT unique in the test data; a keyed
    // table keeps one row per key, so pre-dedup deterministically and
    // mirror the same window in the oracle
    val w = Window.partitionBy("l_orderkey", "l_linenumber")
      .orderBy(col("l_quantity").desc, col("l_returnflag").desc)
    // cache the prepared feed: three upserts each run a plan+write pass
    // over it, and the window dedup should price in once, not six times
    val lDf = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
      .cache()
    val lT = KeyedTable.create(s, s"$root/lineitem", lDf.schema,
      Seq("l_orderkey", "l_linenumber"), numBuckets = 8)
    val p = Stream.fromKeyedTable(lT, maxFilesPerTrigger = 64)
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("total_qty"), count(lit(1)).as("cnt"),
        avg("l_quantity").as("avg_qty"))
      .reduce("avg_qty", update =
        (col("u.total_qty") + col("s.total_qty")) / (col("u.cnt") + col("s.cnt")))
      .writeToPath(s"$root/agg")
    lT.upsert(lDf.where(col("l_orderkey") % 2 === 0), uniqueKeys = true); p.runAvailableNow()
    lT.upsert(lDf.where(col("l_orderkey") % 2 === 1), uniqueKeys = true); p.runAvailableNow()
    lT.upsert(lDf.where(col("l_orderkey") % 7 === 0)
      .withColumn("l_quantity", col("l_quantity") * 3), uniqueKeys = true)
    p.runAvailableNow()
    KeyedTable.forPath(s, s"$root/agg").snapshot()
      .select(col("l_returnflag"), round(col("total_qty"), 2).as("total_qty"),
        col("cnt"), round(col("avg_qty"), 2).as("avg_qty"))
  }

  /** Delete propagation through an incremental INNER join: orders are
    * inserted in two batches, then a slice is deleted from the source —
    * the retraction must remove every joined output row (the reference
    * drops deletes entirely; graft's `handleDeletes` opts in). Oracle
    * is the batch join of the surviving rows. */
  def cdcDeletePropagation(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Stream
    val root = freshDir()
    val oDf = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(s, d).select("c_custkey", "c_name")
    val oT = KeyedTable.create(s, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val cT = KeyedTable.create(s, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 8)
    cT.upsert(cDf, uniqueKeys = true)
    val p = Stream.fromKeyedTable(oT, maxFilesPerTrigger = 64).handleDeletes()
      .join(Stream.fromKeyedTable(cT, maxFilesPerTrigger = 64), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
    oT.upsert(oDf, uniqueKeys = true)
    p.runAvailableNow()
    oT.delete(oDf.where(col("o_orderkey") % 4 === 0).select("o_orderkey"))
    p.runAvailableNow()
    KeyedTable.forPath(s, s"$root/out").snapshot()
  }

  /** Non-owning-side retraction on an incremental LEFT join (the
    * placeholder DOWNGRADE pass): customers left-join suppliers on
    * nationkey; after the seed drain, a slice of suppliers is DELETED
    * and another slice MOVES nation — old pairings must re-pair or
    * downgrade to placeholder rows so the output equals the batch left
    * join of the final snapshots. (The reference strands the old
    * pairings: it never retracts, joins.py:310-343.) */
  def cdcOuterDowngrade(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Stream
    val root = freshDir()
    // every third customer: the nationkey join fans out ~40 suppliers per
    // customer, so the gate's cost is the SEED drain's output volume —
    // a subset keeps every downgrade class at a third of the write cost
    val cDf = Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
      .where(col("c_custkey") % 3 === 0)
    val sDf = Tables.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
    val cT = KeyedTable.create(s, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 8)
    val sT = KeyedTable.create(s, s"$root/supplier", sDf.schema, Seq("s_suppkey"), numBuckets = 8)
    val p = Stream.fromKeyedTable(cT, maxFilesPerTrigger = 64)
      .join(Stream.fromKeyedTable(sT, maxFilesPerTrigger = 64).handleDeletes(), "left")
      .on((l, r) => l("c_nationkey") === r("s_nationkey"))
      .writeToPath(s"$root/out")
    cT.upsert(cDf, uniqueKeys = true)
    sT.upsert(sDf, uniqueKeys = true)
    p.runAvailableNow()
    // NATION-BOUNDED churn (gate economics: the downgrade pass re-derives
    // the affected owning NEIGHBORHOOD — nations here — so unbounded churn
    // re-derives the whole table and drowns the bench record; bounding it
    // keeps every retraction class at a fraction of the cost):
    //  - moves: every supplier of nations 0,1 shifts to 7,8 — old pairings
    //    retract, target-nation customers gain pairings;
    //  - deletes: ALL of nation 22 (its customers downgrade to
    //    placeholders) + every third supplier of nation 20 (partial
    //    retraction, surviving pairings stay).
    sT.upsert(sDf.where(col("s_nationkey") < 2)
      .withColumn("s_nationkey", col("s_nationkey") + 7), uniqueKeys = true)
    sT.delete(sDf.where(col("s_nationkey") === 22 ||
      (col("s_nationkey") === 20 && col("s_suppkey") % 3 === 0))
      .select("s_suppkey"))
    p.runAvailableNow()
    KeyedTable.forPath(s, s"$root/out").snapshot()
  }

  /** Chain propagation of outer-stage downgrades: stage 1 left-joins
    * customers to suppliers on nationkey, stage 2 aggregates per
    * supplier name. Right-side nation moves and deletes must retract
    * through BOTH stages — the downgrade deletes are applied by the
    * agg stage via engine-auto delete handling, and groups emptied by
    * the retraction are dropped. */
  def cdcChainDowngrade(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Stream
    val root = freshDir()
    // every third customer: the gate's cost is its SEED drain (the
    // staged 600k-row join output), not the retraction — same honest
    // volume cut as cdc_outer_downgrade, chain semantics unchanged
    val cDf = Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .where(col("c_custkey") % 3 === 0)
    val sDf = Tables.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
    val cT = KeyedTable.create(s, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 8)
    val sT = KeyedTable.create(s, s"$root/supplier", sDf.schema, Seq("s_suppkey"), numBuckets = 8)
    val p = Stream.fromKeyedTable(cT, maxFilesPerTrigger = 64)
      .join(Stream.fromKeyedTable(sT, maxFilesPerTrigger = 64).handleDeletes(), "left")
      .on((l, r) => l("c_nationkey") === r("s_nationkey"))
      .groupByStaged(s"$root/stage", "s_name")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast("decimal(18,6)")).as("total_bal"))
      .writeToPath(s"$root/agg")
    cT.upsert(cDf, uniqueKeys = true)
    sT.upsert(sDf, uniqueKeys = true)
    p.runIncremental()
    // move ~14% of surviving suppliers, delete 10% — enough churn to
    // exercise every retraction class without re-deriving most of the
    // staged table (the affected neighborhood is what the pass scales
    // with; the semantics are identical at any churn fraction)
    sT.upsert(sDf.where(col("s_suppkey") % 7 === 0 && col("s_suppkey") % 10 =!= 0)
      .withColumn("s_nationkey", (col("s_nationkey") + 7) % 25), uniqueKeys = true)
    sT.delete(sDf.where(col("s_suppkey") % 10 === 0).select("s_suppkey"))
    p.runIncremental()
    KeyedTable.forPath(s, s"$root/agg").snapshot()
      .select(col("s_name"), col("n_cust"),
        round(col("total_bal"), 2).cast("double").as("total_bal"))
  }

  /** Delete retraction through an incremental aggregation: after the
    * delete commit the running (sum, count) must equal the aggregate
    * of the surviving rows only. */
  def cdcAggDeleteRetract(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Stream
    val root = freshDir()
    val oDf = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val oT = KeyedTable.create(s, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val p = Stream.fromKeyedTable(oT, maxFilesPerTrigger = 64).handleDeletes()
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("total"))
      .writeToPath(s"$root/agg")
    oT.upsert(oDf, uniqueKeys = true)
    p.runAvailableNow()
    oT.delete(oDf.where(col("o_orderkey") % 4 === 0).select("o_orderkey"))
    p.runAvailableNow()
    KeyedTable.forPath(s, s"$root/agg").snapshot()
      .select(col("o_orderstatus"), col("cnt"),
        round(col("total"), 2).cast("double").as("total"))
  }

  /** The reference's hardest composed test (tests/JoinTestComplex1.py:7-17):
    * right+`prune(date)` → right+`prune(date)` → left `.on(expr ∧ lit)`
    * over a `.to`-renamed source, as ONE streaming pipeline with
    * late-arriving customer/part sides — placeholder rows must upgrade
    * through BOTH chained stages (upstream-nullable keys stay nullable
    * downstream). Oracle is the equivalent batch join. */
  def joinComplex1(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.{Stream, prune}
    import org.apache.spark.sql.expressions.Window
    val root = freshDir()
    val cDf = Tables.customer(s, d).select("c_custkey", "c_name")
    val oDf = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_custkey").alias("c_custkey"), col("o_totalprice"),
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("int").alias("odate"))
    // (l_orderkey, l_linenumber) is NOT unique in the test data —
    // pre-dedup deterministically and mirror the window in the oracle
    val w = Window.partitionBy("l_orderkey", "l_linenumber")
      .orderBy(col("l_quantity").desc, col("l_partkey").desc)
    val lDf = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .cache()
    val pDf = Tables.part(s, d).select("p_partkey", "p_name", "p_brand")
    val cT = KeyedTable.create(s, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 8)
    val oT = KeyedTable.create(s, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val lT = KeyedTable.create(s, s"$root/lineitem", lDf.schema,
      Seq("o_orderkey", "l_linenumber"), numBuckets = 8)
    val pT = KeyedTable.create(s, s"$root/part", pDf.schema, Seq("p_partkey"), numBuckets = 8)
    val pS = Stream.fromKeyedTable(pT)
      .to(df => df.withColumnRenamed("p_partkey", "part_id"))
      .primaryKeys("part_id")
    val pipe = Stream.fromKeyedTable(cT)
      .join(Stream.fromKeyedTable(oT), "right").onKeys("c_custkey")
      .partitionBy(prune("odate"))
      .join(Stream.fromKeyedTable(lT), "right").onKeys("o_orderkey")
      .partitionBy(prune("odate"))
      .join(pS, "left")
      .on((l2, p) => p("part_id") === l2("l_partkey") && p("p_brand") === lit("Brand#13"))
      .writeToPath(s"$root/out")
    oT.upsert(oDf, uniqueKeys = true)
    lT.upsert(lDf.where(col("o_orderkey") % 2 === 0), uniqueKeys = true)
    pipe.runIncremental()
    cT.upsert(cDf, uniqueKeys = true) // late: placeholders upgrade in stage 1→2→3
    pT.upsert(pDf, uniqueKeys = true) // late: left-join nulls fill in stage 3
    lT.upsert(lDf.where(col("o_orderkey") % 2 === 1), uniqueKeys = true)
    pipe.runIncremental()
    KeyedTable.forPath(s, s"$root/out").snapshot()
  }

  /** Transformed ColumnSelectors in plain `select` positions MID-CHAIN
    * (reference joins.py:62-110 accepts selectors with `.to`/`.alias`
    * anywhere in select): stage 1 projects through transformed
    * selectors, stage 2 keeps joining off the projected output. */
  def joinSelectSel(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Stream
    val root = freshDir()
    val oDf = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
    val nDf = Tables.nation(s, d).select("n_nationkey", "n_name")
    val oT = KeyedTable.create(s, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val cT = KeyedTable.create(s, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 8)
    val nT = KeyedTable.create(s, s"$root/nation", nDf.schema, Seq("n_nationkey"), numBuckets = 2)
    val oS = Stream.fromKeyedTable(oT)
    val cS = Stream.fromKeyedTable(cT)
    val p = oS.join(cS, "inner").on((l, r) => l("o_custkey") === r("c_custkey"))
      .select(oS("o_orderkey"),
        oS("o_totalprice").to(c => c + lit(1.0)).alias("gross"),
        cS("c_name").to(upper).alias("name_upper"),
        cS("c_custkey"), cS("c_nationkey"))
      .join(Stream.fromKeyedTable(nT), "inner")
      .on((l, r) => l("c_nationkey") === r("n_nationkey"))
      .writeToPath(s"$root/out")
    nT.upsert(nDf, uniqueKeys = true)
    cT.upsert(cDf, uniqueKeys = true)
    oT.upsert(oDf, uniqueKeys = true)
    p.runIncremental()
    KeyedTable.forPath(s, s"$root/out").snapshot()
  }

  /** The reference's 5-stage flagship agg test
    * (tests/AggsTestInnerGroupByLeftLeftGroupBy.py:6-22): inner
    * join+`prune` → groupBy+`.reduce` running avg → left join → left
    * join → groupBy, as ONE streaming pipeline. Money sums ride
    * DECIMAL(18,6) end-to-end so incremental accumulation order can't
    * flip a cent vs the oracle. */
  def aggStreamComplex(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.{Stream, prune}
    import org.apache.spark.sql.expressions.Window
    val root = freshDir()
    val cDf = Tables.customer(s, d).select("c_custkey", "c_name")
    val tDf = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_custkey").alias("c_custkey"),
      col("o_totalprice").cast("decimal(18,6)").alias("amount"),
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("int").alias("odate"))
    val w = Window.partitionBy("l_orderkey", "l_linenumber")
      .orderBy(col("l_quantity").desc, col("l_partkey").desc)
    val lDf = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
      .select((col("l_orderkey") * 10 + col("l_linenumber")).alias("order_id"),
        col("l_orderkey").alias("o_orderkey"), col("l_quantity"))
      .cache()
    val cT = KeyedTable.create(s, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 8)
    val tT = KeyedTable.create(s, s"$root/orders", tDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val lT = KeyedTable.create(s, s"$root/lineitem", lDf.schema, Seq("order_id"), numBuckets = 8)
    val p = Stream.fromKeyedTable(cT)
      .join(Stream.fromKeyedTable(tT), "inner").onKeys("c_custkey")
      .partitionBy(prune("odate"))
      .groupBy("c_custkey")
      .agg(sum("amount").as("total_amount"), avg("amount").as("avg"),
        count(lit(1)).as("count"))
      .reduce("avg", update = (col("u.total_amount") + col("s.total_amount")) /
        (col("u.count") + col("s.count")))
      .join(Stream.fromKeyedTable(tT), "left").onKeys("c_custkey")
      .join(Stream.fromKeyedTable(lT), "left").onKeys("o_orderkey")
      .groupBy("order_id")
      .agg(sum("total_amount").as("total_amount_per_order"))
      .writeToPath(s"$root/out")
    lT.upsert(lDf, uniqueKeys = true)
    tT.upsert(tDf.where(col("o_orderkey") % 2 === 0), uniqueKeys = true)
    cT.upsert(cDf, uniqueKeys = true)
    p.runIncremental()
    tT.upsert(tDf.where(col("o_orderkey") % 2 === 1), uniqueKeys = true)
    // update wave: amounts change → agg deltas + downstream retraction
    tT.upsert(tDf.where(col("o_orderkey") % 7 === 0)
      .withColumn("amount", (col("amount") * 2).cast("decimal(18,6)")), uniqueKeys = true)
    p.runIncremental()
    KeyedTable.forPath(s, s"$root/out").snapshot()
      .select(col("order_id"),
        round(col("total_amount_per_order"), 2).cast("double").as("total_amount_per_order"))
  }

  /** A16/A17 named-table surface: sources and sink live in a
    * TableCatalog, the pipeline is wired by name (`fromTable` →
    * `writeToTable`), and the result is read back through plain
    * `spark.sql` on the registered view. */
  def tableCatalogSql(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Stream
    import graft.store.TableCatalog
    val cat = new TableCatalog(s, s"${freshDir()}/warehouse")
    val oDf = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(s, d).select("c_custkey", "c_name")
    val oT = cat.create("orders_src", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val cT = cat.create("customer_src", cDf.schema, Seq("c_custkey"), numBuckets = 8)
    val q = Stream.fromTable(cat, "orders_src")
      .join(Stream.fromTable(cat, "customer_src"), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToTable(cat, "enriched")
      .start()
    try {
      cT.upsert(cDf, uniqueKeys = true)
      oT.upsert(oDf, uniqueKeys = true)
      q.processAllAvailable()
    } finally q.stop()
    cat.registerView("enriched")
    s.sql("SELECT o_orderkey, o_custkey, o_totalprice, c_custkey, c_name FROM enriched")
  }

  /** A28/A30/A41/C5 composed: the full layout-maintenance lifecycle
    * under data churn — upsert waves interleaved with incremental
    * optimize, compact, a STEPPED rebucket, a predicate delete, and the
    * one-call `maintain()` driver (health-read passes + retention) —
    * with the surviving snapshot hash-checked against a recomputed
    * oracle.
    * Layout ops must be pure reorganizations: every one of them runs
    * BETWEEN or AROUND content commits and none may change what the
    * final snapshot reads. */
  def maintenanceCycle(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val kt = KeyedTable.create(s, freshDir(), o.schema,
      keys = Seq("o_orderkey"), numBuckets = 16)
    kt.upsert(o, uniqueKeys = true) // wave 1: full load
    kt.upsert(o.where(col("o_orderkey") % 7 === 0) // wave 2: price bump
      .withColumn("o_totalprice", col("o_totalprice") + 100.0),
      uniqueKeys = true)
    // stepped optimize (4-bucket claimed commits) between the waves
    kt.optimizeIncremental(Seq("o_custkey"), bucketsPerStep = 4)
    // wave 3: WHOLE-ROW upsert from the original source — for keys also
    // in wave 2 (%7 and %11) latest-wins replace reverts the +100
    kt.upsert(o.where(col("o_orderkey") % 11 === 0)
      .withColumn("o_orderstatus", lit("M")), uniqueKeys = true)
    kt.compact(minFileBytes = 64L << 20)
    // STEPPED rebucket (r15): staged byte-budgeted ranges + one cutover
    // commit — the growth path a 100 TB table actually takes; the small
    // budget forces a real multi-step run at every driver SF
    kt.rebucketIncremental(32, maxStepBytes = 2L << 20)
    kt.deleteWhere(col("o_orderkey") % 13 === 0)
    // one-call maintenance driver over the churned table: reads health,
    // runs owed passes (compact here; growth/clustering not owed), then
    // retention — replaces the explicit vacuum+truncate calls
    kt.maintain(graft.store.MaintenancePolicy(
      compactMinFileBytes = 64L << 20,
      vacuumRetainVersions = Some(1),
      truncateRetainVersions = Some(2)))
    kt.snapshot()
  }

  /** Driver-certified static-side pruning (SURVEY §6l-2-2): the same
    * incremental inner join drained with pruning FORCED ON
    * (minBytes=0) — every join half reads only the probe batch's
    * buckets of the other side's table instead of its full snapshot —
    * must equal the plain SQL join, across seed, late-arrival, and
    * update waves. */
  def joinPruneStatic(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Stream
    val root = freshDir()
    val oDf = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(s, d).select("c_custkey", "c_name")
    val oT = KeyedTable.create(s, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val cT = KeyedTable.create(s, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 8)
    val p = Stream.fromKeyedTable(oT)
      .join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
    s.conf.set("spark.graft.join.staticPrune.minBytes", "0")
    try {
      cT.upsert(cDf.where(col("c_custkey") % 2 === 0), uniqueKeys = true)
      oT.upsert(oDf.where(col("o_orderkey") % 2 === 0), uniqueKeys = true)
      p.runIncremental()
      // late right rows: their batch probes the left static pruned
      oT.upsert(oDf.where(col("o_orderkey") % 2 === 1), uniqueKeys = true)
      cT.upsert(cDf.where(col("c_custkey") % 2 === 1), uniqueKeys = true)
      p.runIncremental()
      oT.upsert(oDf.where(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2), uniqueKeys = true)
      p.runIncremental()
    } finally s.conf.unset("spark.graft.join.staticPrune.minBytes")
    KeyedTable.forPath(s, s"$root/out").snapshot()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "maintenance_cycle" -> (maintenanceCycle _),
    "cdc_time_travel" -> (cdcTimeTravel _),
    "cdc_changes_since" -> (cdcChangesSince _),
    "join_complex1" -> (joinComplex1 _),
    "join_select_sel" -> (joinSelectSel _),
    "agg_stream_complex" -> (aggStreamComplex _),
    "table_catalog_sql" -> (tableCatalogSql _),
    "cdc_delete_propagation" -> (cdcDeletePropagation _),
    "cdc_outer_downgrade" -> (cdcOuterDowngrade _),
    "cdc_chain_downgrade" -> (cdcChainDowngrade _),
    "cdc_agg_delete_retract" -> (cdcAggDeleteRetract _),
    "cdc_join_incremental" -> (cdcJoinIncremental _),
    "join_prune_static" -> (joinPruneStatic _),
    "cdc_agg_reduce_incremental" -> (cdcAggReduceIncremental _),
    "cdc_upsert_snapshot" -> (cdcUpsertSnapshot _),
    "cdc_seq_latest_wins" -> (cdcSeqLatestWins _),
    "cdc_agg_incremental" -> (cdcAggIncremental _),
    "occ_multi_writer" -> (occMultiWriter _),
    "keyed_lookup" -> (keyedLookup _),
    "index_lookup" -> (indexLookup _),
    "manifest_point_merge" -> (manifestPointMerge _),
    "manifest_insert_probe" -> (manifestInsertProbe _),
    "scan_zone_skip" -> (scanZoneSkip _),
    "delete_where" -> (deleteWhereGate _))

  val oracleSql: Map[String, String] = Map(
    // wave 3 (%11) is a whole-row replace built from the ORIGINAL rows,
    // so it reverts wave 2's +100 where the waves overlap; %13 deleted
    "maintenance_cycle" ->
      """SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 11 = 0 THEN 'M' ELSE o_orderstatus END
             AS o_orderstatus,
           o_totalprice + CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
             THEN 100.0 ELSE 0 END AS o_totalprice
         FROM orders WHERE o_orderkey % 13 <> 0""",
    // every interleaving of the two racing writers converges here —
    // each parity's LAST merge (i=3) wins its keys
    "occ_multi_writer" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0 THEN 'W03' ELSE 'W13' END AS o_orderstatus,
           o_totalprice + CASE WHEN o_orderkey % 2 = 0 THEN 30 ELSE 1030 END AS o_totalprice
         FROM orders""",
    "keyed_lookup" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderkey % 150 = 7""",
    "scan_zone_skip" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'""",
    "delete_where" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
         WHERE NOT (o_orderdate < TIMESTAMP '1997-01-01')""",
    "manifest_point_merge" ->
      // wave 3's whole-row upsert is built from the ORIGINAL source, so
      // under latest-wins replace semantics it reverts wave 2's +1000
      // for keys both waves touch (k % 151 = 0 AND k % 211 = 3 — absent
      // at sf0.01's sparse keyset, real at sf0.1)
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 211 = 3 THEN o_custkey + 500000 ELSE o_custkey END AS o_custkey,
           o_totalprice + CASE WHEN o_orderkey % 151 = 0 AND o_orderkey % 211 <> 3
             THEN 1000.0 ELSE 0 END AS o_totalprice
         FROM orders WHERE o_orderkey % 163 <> 1""",
    "manifest_insert_probe" ->
      """SELECT o_orderkey, o_custkey,
           o_totalprice * CASE WHEN o_orderkey % 97 = 5 THEN 2 ELSE 1 END
             AS o_totalprice
         FROM orders""",
    "index_lookup" ->
      """WITH fin0 AS (SELECT o_orderkey,
             CASE WHEN o_orderkey % 100 = 0 THEN o_custkey + 100000 ELSE o_custkey END AS o_custkey,
             o_totalprice FROM orders),
         fin AS (SELECT * FROM fin0 WHERE o_orderkey % 97 <> 0)
         SELECT o_orderkey, o_custkey, o_totalprice FROM fin
         WHERE o_custkey % 211 = 5""",
    "join_complex1" ->
      """WITH li0 AS (
           SELECT l_orderkey AS o_orderkey, l_linenumber, l_partkey, l_quantity,
             row_number() OVER (PARTITION BY l_orderkey, l_linenumber
               ORDER BY l_quantity DESC, l_partkey DESC) AS rn
           FROM lineitem),
         li AS (SELECT o_orderkey, l_linenumber, l_partkey, l_quantity
           FROM li0 WHERE rn = 1),
         o AS (SELECT o_orderkey, o_custkey AS c_custkey, o_totalprice,
             CAST(date_part('year', o_orderdate) * 100 +
                  date_part('month', o_orderdate) AS INT) AS odate
           FROM orders),
         s1 AS (SELECT c.c_name, o.o_orderkey, o.c_custkey, o.o_totalprice, o.odate
           FROM customer c RIGHT JOIN o ON c.c_custkey = o.c_custkey),
         s2 AS (SELECT s1.c_name, s1.c_custkey, s1.o_totalprice, s1.odate,
             li.o_orderkey, li.l_linenumber, li.l_partkey, li.l_quantity
           FROM s1 RIGHT JOIN li ON s1.o_orderkey = li.o_orderkey)
         SELECT s2.*, p.p_partkey AS part_id, p.p_name, p.p_brand
         FROM s2 LEFT JOIN part p
           ON p.p_partkey = s2.l_partkey AND p.p_brand = 'Brand#13'""",
    "join_select_sel" ->
      """SELECT o_orderkey, o_totalprice + 1.0 AS gross,
           upper(c_name) AS name_upper, c_custkey, c_nationkey,
           n_nationkey, n_name
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey""",
    "agg_stream_complex" ->
      """WITH li0 AS (
           SELECT l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_orderkey, l_linenumber
               ORDER BY l_quantity DESC, l_partkey DESC) AS rn
           FROM lineitem),
         li AS (SELECT l_orderkey * 10 + l_linenumber AS order_id,
             l_orderkey AS o_orderkey
           FROM li0 WHERE rn = 1),
         t AS (SELECT o_orderkey, o_custkey AS c_custkey,
             CASE WHEN o_orderkey % 7 = 0
               THEN CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 2 AS DECIMAL(18,6))
               ELSE CAST(o_totalprice AS DECIMAL(18,6)) END AS amount
           FROM orders),
         g AS (SELECT t.c_custkey, sum(amount) AS total_amount
           FROM customer c JOIN t ON c.c_custkey = t.c_custkey
           GROUP BY t.c_custkey),
         s3 AS (SELECT g.c_custkey, g.total_amount, t.o_orderkey
           FROM g LEFT JOIN t ON g.c_custkey = t.c_custkey),
         s4 AS (SELECT s3.*, li.order_id
           FROM s3 LEFT JOIN li ON s3.o_orderkey = li.o_orderkey)
         SELECT order_id,
           round(sum(total_amount), 2)::DOUBLE AS total_amount_per_order
         FROM s4 GROUP BY order_id""",
    "cdc_time_travel" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders""",
    "cdc_changes_since" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
           'update_preimage' AS _change_type, 2 AS _commit_version
         FROM orders WHERE o_orderkey % 3 = 0
         UNION ALL
         SELECT o_orderkey, o_orderstatus, o_totalprice * 2.0,
           'update_postimage', 2
         FROM orders WHERE o_orderkey % 3 = 0""",
    "table_catalog_sql" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_custkey, c_name
         FROM orders JOIN customer ON o_custkey = c_custkey""",
    "cdc_delete_propagation" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_custkey, c_name
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderkey % 4 <> 0""",
    "cdc_outer_downgrade" ->
      """SELECT c.c_custkey, c.c_name, c.c_nationkey,
                s.s_suppkey, s.s_name, s.s_nationkey
         FROM (SELECT * FROM customer WHERE c_custkey % 3 = 0) c LEFT JOIN (
           SELECT s_suppkey, s_name,
             CASE WHEN s_nationkey < 2 THEN s_nationkey + 7
                  ELSE s_nationkey END AS s_nationkey
           FROM supplier
           WHERE NOT (s_nationkey = 22
                      OR (s_nationkey = 20 AND s_suppkey % 3 = 0))) s
         ON c.c_nationkey = s.s_nationkey""",
    "cdc_chain_downgrade" ->
      """SELECT s.s_name, count(*) AS n_cust,
           round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2)::DOUBLE AS total_bal
         FROM (SELECT * FROM customer WHERE c_custkey % 3 = 0) c LEFT JOIN (
           SELECT s_suppkey, s_name,
             CASE WHEN s_suppkey % 7 = 0 THEN (s_nationkey + 7) % 25
                  ELSE s_nationkey END AS s_nationkey
           FROM supplier WHERE s_suppkey % 10 <> 0) s
         ON c.c_nationkey = s.s_nationkey
         GROUP BY s.s_name""",
    "cdc_agg_delete_retract" ->
      """SELECT o_orderstatus, count(*) AS cnt,
           round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS total
         FROM orders WHERE o_orderkey % 4 <> 0
         GROUP BY o_orderstatus""",
    "cdc_join_incremental" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_custkey, c_name
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey""",
    "join_prune_static" ->
      """SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                ELSE o_totalprice END AS o_totalprice,
           c_custkey, c_name
         FROM orders JOIN customer ON o_custkey = c_custkey""",
    "cdc_agg_reduce_incremental" ->
      """WITH u AS (
           SELECT l_orderkey, l_returnflag, l_quantity, row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY l_quantity DESC, l_returnflag DESC) AS rn
           FROM lineitem),
         l AS (SELECT l_returnflag,
           CASE WHEN l_orderkey % 7 = 0 THEN l_quantity * 3 ELSE l_quantity END AS q
           FROM u WHERE rn = 1)
         SELECT l_returnflag, round(sum(q), 2) AS total_qty, count(*) AS cnt,
           round(sum(q) / count(*), 2) AS avg_qty
         FROM l GROUP BY l_returnflag""",
    "cdc_upsert_snapshot" ->
      """SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice
         FROM orders""",
    "cdc_seq_latest_wins" ->
      """SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2.0 ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END AS seq
         FROM orders""",
    "cdc_agg_incremental" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS total_qty, count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag""")
}
