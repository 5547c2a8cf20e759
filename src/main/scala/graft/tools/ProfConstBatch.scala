package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB plan-cost prediction, tested directly (SURVEY §6s-4 /
  * r12 verdict #3, extended r14 verdict #7): per-commit drain cost is
  * claimed FLAT in total data volume as long as byte-budgeted drains
  * hold per-sub-batch bytes constant — growth in the r12 sf1 profile's
  * plan phase was the staged-batch collect, which is batch-bytes-
  * proportional, not history- or table-size-proportional.
  *
  * The bench gates can't test that claim: they seed each source with
  * ONE fat upsert, and a byte budget can never split below commit
  * granularity. This probe seeds a stream-stream join source with
  * MANY fixed-row-count commits (so per-commit bytes are constant
  * across scale factors by construction), drains once under a pinned
  * `spark.graft.drain.maxBytes`, and prints per-phase totals and the
  * output commit count. Run at two scales with identical chunkRows
  * and budget: the prediction is plan/write seconds PER COMMIT stay
  * ~flat while the commit count scales with the data.
  *
  * Four workload arms (r14: the insert-only arm was the membership
  * probe's best case; these cover the hit-path carry ratio too):
  *  - insert (default): every chunk is new keys — the probe must carry
  *    every existing file; write cost per commit ∝ batch bytes.
  *  - update: each commit point-updates ~chunkRows uniformly-spread
  *    EXISTING keys of a fully-seeded table laid out at a fixed
  *    rows-per-file — per-commit write cost is bounded by
  *    (keys hit × file size), independent of TABLE size.
  *  - mixed: half new keys, half point updates per commit.
  *  - skew: every commit's updates land in ONE bucket's key space —
  *    bucket-level pruning must keep the other 7/8 untouched.
  *  - point: direct small upsert waves (chunkRows each, half new keys /
  *    half updates) against the fully-seeded table with the membership
  *    probe forced on — the SKETCH tier's home turf (staged rows ≤
  *    sketchProbeMaxRows ⇒ driver-side footer-bloom probe, no read
  *    job): planProbe per wave must stay flat and tiny across SFs,
  *    where the exact probe re-scanned every candidate's hash column.
  *    Run with chunkRows ≤ 2000 (e.g. 500); the measured region is the
  *    waves themselves, no drain.
  *  - clustered (r15, r14 verdict #5/#6): each wave updates ~chunkRows
  *    keys CONFINED to one contiguous key-hash window (disjoint windows
  *    per wave) — the co-located shape the scattered update/mixed/skew
  *    arms deliberately lack. Separates "inherent scatter cost" (a key
  *    in every file forces rewriting every file) from probe health:
  *    here only the few files covering the window may rewrite, so
  *    write s/commit must stay flat and small across SFs. Also the
  *    ADAPTIVE sketch tier's home turf at chunkRows ABOVE the fixed
  *    2000-row cut: expected falsely-kept files ≈ Σ min(1, n_f·fpp)
  *    over the window's few candidates stays under target, so the
  *    probe stays a driver-side footer read; pass conf
  *    spark.graft.merge.sketchTargetFalseKept=0 as an A/B control to
  *    force the exact tier on the identical workload.
  *
  * Usage: ProfConstBatch <sfDir> [chunkRows=50000] [budgetBytes=3000000]
  *        [mode=insert|update|mixed|skew|point|clustered] [conf=k=v;k=v]
  */
object ProfConstBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val chunkRows = if (args.length > 1) args(1).toLong else 50000L
    val budget = if (args.length > 2) args(2).toLong else 3000000L
    val mode = if (args.length > 3) args(3) else "insert"
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.merge.shufflePartitions", "8")
      .config("spark.ui.enabled", "false")
    // arm-specific conf pairs, e.g. conf=spark.graft.merge.sketchTargetFalseKept=0
    if (args.length > 4) args(4).stripPrefix("conf=").split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, chunkRows, budget, mode) finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, chunkRows: Long,
      budget: Long, mode: String = "insert"): Unit = {
    // autoCompact.maxFiles is raised for the whole non-insert arm (it
    // must stay up through the waves), so restore it at the very end —
    // callers reusing the SparkSession must not inherit the knob
    val prevMaxFiles = spark.conf.getOption("spark.graft.autoCompact.maxFiles")
    try runArm(spark, sfDir, chunkRows, budget, mode)
    finally prevMaxFiles match {
      case Some(v) => spark.conf.set("spark.graft.autoCompact.maxFiles", v)
      case None    => spark.conf.unset("spark.graft.autoCompact.maxFiles")
    }
  }

  private def runArm(spark: SparkSession, sfDir: String, chunkRows: Long,
      budget: Long, mode: String): Unit = {
    import graft.store.{KeyedTable, PhaseStats}
    import graft.streaming.Stream
    val root = java.nio.file.Files
      .createTempDirectory("graft-constbatch").toString
    val cDf = graft.Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_name")
    val oDf = graft.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey").alias("c_custkey"),
        col("o_totalprice"))
    val nOrders = oDf.count()
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema,
      Seq("c_custkey"), numBuckets = 8)
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema,
      Seq("o_orderkey"), numBuckets = 8)
    val pipe = Stream.fromKeyedTable(cT)
      .join(Stream.fromKeyedTable(oT), "inner").onKeys("c_custkey")
      .writeToPath(s"$root/out")
    cT.upsert(cDf, uniqueKeys = true)
    val hash = xxhash64(col("o_orderkey"))
    var srcCommits = 0
    if (mode == "insert") {
      // the fact side lands as nChunks commits of ~chunkRows NEW keys
      // each — constant per-commit bytes across scale factors
      val nChunks = math.max(1L, (nOrders + chunkRows - 1) / chunkRows).toInt
      val chunked = oDf.withColumn("__chunk",
        pmod(col("o_orderkey"), lit(nChunks.toLong)).cast("int")).cache()
      chunked.count()
      (0 until nChunks).foreach { i =>
        oT.upsert(chunked.where(col("__chunk") === i).drop("__chunk"),
          uniqueKeys = true)
      }
      chunked.unpersist()
      srcCommits = nChunks
    } else {
      // production-shaped layout: fixed rows per FILE, so file size is
      // constant across SF and file count carries the scale. A real
      // table at this shape also scales its BUCKET count (autoRebucket)
      // so files-per-bucket stays bounded; with the probe's fixed 8
      // buckets the sf3 seed exceeds autoCompact.maxFiles=16 and every
      // wave's fold would rewrite the table — raise the bound so the
      // arms measure the PROBE's carry ratio, not the fold (whose own
      // behavior is gate- and spec-pinned elsewhere)
      // seed file size is the probe's main lever: 20k rows (~0.5 MB)
      // models a small-file tail; raise via spark.graft.probe.seedFileRows
      // (e.g. 200000 ≈ 5 MB) to model post-compaction production files —
      // above merge.sketchMinFileBytes the footer-sketch path engages
      spark.conf.set("spark.graft.targetFileRows", spark.conf
        .getOption("spark.graft.probe.seedFileRows").getOrElse("20000"))
      spark.conf.set("spark.graft.autoCompact.maxFiles", "256")
      try oT.upsert(oDf, uniqueKeys = true)
      finally spark.conf.unset("spark.graft.targetFileRows")
      val waves = 12
      // ~chunkRows uniformly-spread keys per wave, disjoint across
      // waves via hash residues (sampling 1-in-res of the key space)
      val res = math.max(waves.toLong, nOrders / chunkRows)
      def updates(i: Int): DataFrame = mode match {
        case "update" =>
          oDf.where(pmod(hash, lit(res)) === i)
            .withColumn("o_totalprice", -col("o_totalprice"))
        case "mixed" =>
          // half updates, half NEW keys (shifted far past the key space)
          oDf.where(pmod(hash, lit(res * 2)) === i)
            .withColumn("o_totalprice", -col("o_totalprice"))
            .unionByName(oDf.where(pmod(hash, lit(res * 2)) === i + res)
              .withColumn("o_orderkey",
                col("o_orderkey") + lit(nOrders * 10 + i.toLong)))
        case "skew" =>
          // all updates inside bucket 0's key space (bucketExpr is the
          // same xxhash64 modulo numBuckets=8); disjoint waves via the
          // next residue level
          oDf.where(pmod(hash, lit(8L)) === 0 &&
              pmod(hash, lit(8L * waves)) === i * 8L)
            .withColumn("o_totalprice", -col("o_totalprice"))
        case "clustered" =>
          // ~chunkRows keys from one CONTIGUOUS key-hash window, a
          // disjoint window per wave. Files are written key-hash-sorted,
          // so each bucket contributes only the 1-2 files whose span
          // covers the window — per-commit rewrite cost is bounded by
          // (buckets × files-in-window), independent of table size.
          val nWin = math.max(waves.toLong, nOrders / math.max(1L, chunkRows))
          val step = math.pow(2.0, 64) / nWin.toDouble
          val lo = Long.MinValue + (step * i).toLong
          val hi =
            if (i + 1 >= nWin) Long.MaxValue
            else Long.MinValue + (step * (i + 1)).toLong - 1
          oDf.where(hash >= lo && hash <= hi)
            .withColumn("o_totalprice", -col("o_totalprice"))
        case other => sys.error(s"unknown mode $other")
      }
      if (mode == "point") {
        // measured region: the small upsert waves themselves (half new
        // keys, half updates), probe forced on — no drain. A wave's
        // write cost must be a few files and its planProbe sketch-cheap
        // at EVERY table size.
        val per = math.max(waves.toLong, nOrders / math.max(1L, chunkRows / 2))
        def wavelet(i: Int): DataFrame =
          oDf.where(pmod(hash, lit(per)) === i)
            .withColumn("o_totalprice", -col("o_totalprice"))
            .unionByName(oDf.where(pmod(hash, lit(per)) === i + waves)
              .withColumn("o_orderkey",
                col("o_orderkey") + lit(nOrders * 10 + i.toLong)))
        val batches = (0 until waves).map(i => wavelet(i).cache())
        batches.foreach(_.count()) // build outside the measured region
        PhaseStats.reset()
        spark.conf.set("spark.graft.merge.matchPruneMinBytes", "0")
        val t0 = System.nanoTime()
        try batches.foreach(b => oT.upsert(b, uniqueKeys = true))
        finally spark.conf.unset("spark.graft.merge.matchPruneMinBytes")
        val wall = (System.nanoTime() - t0) / 1e9
        batches.foreach(_.unpersist())
        emit(spark, sfDir, mode, nOrders, chunkRows, budget,
          srcCommits = waves, outCommits = waves, wall = wall)
        return
      }
      if (mode == "clustered") {
        // probe forced on (mirrors point mode): the window's candidate
        // bytes sit below the default probe floor at small SFs, and the
        // arm exists to measure the probe's tiering, not the floor
        val batches = (0 until waves).map(i => updates(i).cache())
        batches.foreach(_.count()) // build outside the measured region
        PhaseStats.reset()
        spark.conf.set("spark.graft.merge.matchPruneMinBytes", "0")
        val t0 = System.nanoTime()
        try batches.foreach(b => oT.upsert(b, uniqueKeys = true))
        finally spark.conf.unset("spark.graft.merge.matchPruneMinBytes")
        val wall = (System.nanoTime() - t0) / 1e9
        batches.foreach(_.unpersist())
        emit(spark, sfDir, mode, nOrders, chunkRows, budget,
          srcCommits = waves, outCommits = waves, wall = wall)
        return
      }
      (0 until waves).foreach(i => oT.upsert(updates(i), uniqueKeys = true))
      srcCommits = waves
    }
    // measured region: ONE byte-budgeted drain over the whole backlog
    PhaseStats.reset()
    spark.conf.set("spark.graft.drain.maxBytes", budget.toString)
    val t0 = System.nanoTime()
    try pipe.runIncremental()
    finally spark.conf.unset("spark.graft.drain.maxBytes")
    val wall = (System.nanoTime() - t0) / 1e9
    val out = KeyedTable.forPath(spark, s"$root/out")
    emit(spark, sfDir, mode, nOrders, chunkRows, budget,
      srcCommits = srcCommits, outCommits = out.latestVersion, wall = wall)
  }

  private def emit(spark: SparkSession, sfDir: String, mode: String,
      nOrders: Long, chunkRows: Long, budget: Long, srcCommits: Int,
      outCommits: Long, wall: Double): Unit = {
    import graft.store.PhaseStats
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val ph = PhaseStats.snapshot().toSeq.sortBy(_._1)
      .map { case (k, (n, s)) => "\"" + k + "\":[" + n + "," + fmt(s) + "]" }
      .mkString("{", ",", "}")
    val sfName = new java.io.File(sfDir).getName
    println(s"""{"probe":"const_batch","mode":"$mode","sf":"$sfName",""" +
      s""""orders":$nOrders,"chunkRows":$chunkRows,"srcCommits":$srcCommits,""" +
      s""""budget":$budget,"outCommits":$outCommits,"wall":${fmt(wall)},""" +
      s""""phases":$ph}""")
  }
}
