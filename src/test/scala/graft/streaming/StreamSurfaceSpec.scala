package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.store.KeyedTable

import java.nio.file.Files

/** Reference-surface features beyond the core join/agg path:
  * partitionBy+prune (A11), stream union (A12), user foreachBatch
  * (ref joins.py:536), writer conf (A17).
  */
class StreamSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String = Files.createTempDirectory("gss").toString

  test("partitionBy(prune) join stage converges to batch result") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .withColumn("o_year", year(col("o_orderdate")))
      .drop("o_orderdate")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf)
    val q = Stream.fromKeyedTable(oT).join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .partitionBy(prune("o_year"))
      .writeToPath(s"$root/out").start()
    try {
      // two batches hitting disjoint year partitions, then an update
      oT.upsert(oDf.where(col("o_year") <= 1997)); q.processAllAvailable()
      oT.upsert(oDf.where(col("o_year") > 1997)); q.processAllAvailable()
      oT.upsert(oDf.where(col("o_orderkey") % 11 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 5.0))
      q.processAllAvailable()
      val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
      val want = oT.snapshot().join(cDf, col("o_custkey") === col("c_custkey"))
      val cols = want.columns.sorted.map(col).toIndexedSeq
      assert(got.select(cols: _*).exceptAll(want.select(cols: _*)).count() == 0)
      assert(want.select(cols: _*).exceptAll(got.select(cols: _*)).count() == 0)
      assert(KeyedTable.forPath(spark, s"$root/out").meta.prunedCols == Seq("o_year"))
    } finally q.stop()
  }

  test("stream union feeds both tables' changes into one join") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val half1 = oDf.where(col("o_orderkey") % 2 === 0)
    val half2 = oDf.where(col("o_orderkey") % 2 === 1)
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val t1 = KeyedTable.create(spark, s"$root/o1", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val t2 = KeyedTable.create(spark, s"$root/o2", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/c", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf)
    val unioned = Stream.fromKeyedTable(t1).union(Stream.fromKeyedTable(t2))
    val q = unioned.join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out").start()
    try {
      t1.upsert(half1); t2.upsert(half2); q.processAllAvailable()
      val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
      val want = oDf.join(cDf, col("o_custkey") === col("c_custkey"))
      assert(got.count() == want.count())
    } finally q.stop()
  }

  test("user foreachBatch sink receives combined join deltas") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf)
    @volatile var seen = 0L
    val q = Stream.fromKeyedTable(oT).join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .foreachBatch(s"$root/cp") { (df: DataFrame, _: Long) => seen += df.count() }
      .start()
    try {
      oT.upsert(oDf); q.processAllAvailable()
      assert(seen == oDf.count()) // every order matches exactly one customer
    } finally q.stop()
  }

  test("pipeline writer conf: queryName and trigger are applied") {
    val root = tmp()
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/c", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf); oT.upsert(oDf)
    val q = Stream.fromKeyedTable(oT).join(Stream.fromKeyedTable(cT), "left")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
      .queryName("my-gold-join")
      .option("spark.graft.marker", "1")
      .start()
    try {
      assert(q.queries.last._2.name == "my-gold-join")
      q.processAllAvailable()
      assert(KeyedTable.forPath(spark, s"$root/out").snapshot().count() == oDf.count())
    } finally q.stop()
  }

  test("agg stage partitionBy(prune) converges and records pruned cols") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val q = Stream.fromKeyedTable(oT)
      .groupBy("o_orderstatus")
      .agg(sum("o_totalprice").as("total"), count(lit(1)).as("cnt"))
      .partitionBy(prune("o_orderstatus"))
      .writeToPath(s"$root/agg").start()
    try {
      oT.upsert(oDf.where(col("o_orderkey") % 2 === 0)); q.processAllAvailable()
      oT.upsert(oDf.where(col("o_orderkey") % 2 === 1)); q.processAllAvailable()
      val outT = KeyedTable.forPath(spark, s"$root/agg")
      assert(outT.meta.prunedCols == Seq("o_orderstatus"))
      val got = outT.snapshot().select(col("o_orderstatus"),
        round(col("total"), 2).as("total"), col("cnt"))
      val want = oT.snapshot().groupBy("o_orderstatus")
        .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("cnt"))
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("select with transformed ColumnSels (ref joins.py:62-110) projects correctly") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/c", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf)
    val oS = Stream.fromKeyedTable(oT)
    val cS = Stream.fromKeyedTable(cT)
    val q = oS.join(cS, "inner").on((l, r) => l("o_custkey") === r("c_custkey"))
      .select(oS("o_orderkey"),
        oS("o_totalprice").to(c => c + lit(1.0)).alias("gross"),
        cS("c_name").to(upper).alias("name_upper"),
        cS("c_custkey"))
      .writeToPath(s"$root/out").start()
    try {
      oT.upsert(oDf); q.processAllAvailable()
      val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
      assert(got.columns.toSeq == Seq("o_orderkey", "gross", "name_upper", "c_custkey"))
      val want = oDf.join(cDf, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), (col("o_totalprice") + 1.0).as("gross"),
          upper(col("c_name")).as("name_upper"), col("c_custkey"))
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("delete retraction rewrites only buckets containing matches") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 16)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 16)
    cT.upsert(cDf)
    val q = Stream.fromKeyedTable(oT).handleDeletes()
      .join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out").start()
    try {
      oT.upsert(oDf); q.processAllAvailable()
      val out = KeyedTable.forPath(spark, s"$root/out")
      val before = out.snapshot().count()
      // delete ONE source key → the retraction must resolve it to full
      // output keys and bucket-prune: the delete commit's data dir may
      // contain at most the one bucket holding that key's output row
      val victim = oDf.select("o_orderkey").orderBy("o_orderkey").limit(1)
      oT.delete(victim); q.processAllAvailable()
      val out2 = KeyedTable.forPath(spark, s"$root/out")
      assert(out2.snapshot().count() == before - 1)
      val v = out2.latestVersion
      val lg = new graft.store.CommitLog(s"$root/out", spark.sessionState.newHadoopConf())
      val dir = new org.apache.hadoop.fs.Path(s"$root/out/data/${lg.dirOf(v)}")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val bucketDirs =
        if (!fs.exists(dir)) Seq.empty
        else fs.listStatus(dir).toSeq.map(_.getPath.getName).filter(_.startsWith("b="))
      assert(bucketDirs.size <= 1,
        s"delete commit rewrote ${bucketDirs.size} buckets: $bucketDirs")
    } finally q.stop()
  }

  test("delete retraction with pks strictly containing bucket keys deletes exactly") {
    // the deleting side's pks (k, a_sub) strictly contain the output's
    // bucket keys (k): a_sub is upstream-nullable, so outKeySplit
    // excludes it from the bucket keys. The bucket-key-only fast path
    // must still filter on the FULL pks — deleting (k=1, a_sub=10)
    // must not retract the surviving (k=1, a_sub=11) output row.
    val root = tmp()
    import spark.implicits._
    val aDf = Seq((1L, 10L, "ax"), (1L, 11L, "ay"), (2L, 20L, "b"))
      .toDF("k", "a_sub", "payload")
    val bDf = Seq((1L, "m"), (2L, "n")).toDF("k", "b_val")
    val aT = KeyedTable.create(spark, s"$root/a", aDf.schema,
      Seq("k", "a_sub"), nullableKeys = Seq("a_sub"), numBuckets = 4)
    val bT = KeyedTable.create(spark, s"$root/b",
      bDf.schema, Seq("k"), numBuckets = 4)
    bT.upsert(bDf)
    val q = Stream.fromKeyedTable(aT).handleDeletes()
      .join(Stream.fromKeyedTable(bT), "inner")
      .onKeys("k")
      .writeToPath(s"$root/out").start()
    try {
      aT.upsert(aDf, uniqueKeys = true); q.processAllAvailable()
      val out = KeyedTable.forPath(spark, s"$root/out")
      assert(out.meta.bucketKeys == Seq("k") &&
        out.meta.keys.toSet == Set("k", "a_sub"),
        s"precondition: pks must strictly contain bucket keys, got " +
          s"keys=${out.meta.keys} bucket=${out.meta.bucketKeys}")
      assert(out.snapshot().count() == 3)
      aT.delete(Seq((1L, 10L)).toDF("k", "a_sub")); q.processAllAvailable()
      val left = KeyedTable.forPath(spark, s"$root/out").snapshot()
        .select("k", "a_sub").as[(Long, Long)].collect().toSet
      assert(left == Set((1L, 11L), (2L, 20L)),
        s"only (1,10) may be retracted; surviving rows: $left")
    } finally q.stop()
  }

  test("delete retraction resolves via the lazily-built secondary index, file-pruned") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 16)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 16)
    cT.upsert(cDf)
    // force the index strategy: the test table is far below the
    // size threshold where it engages on its own
    spark.conf.set("spark.graft.retract.indexMinBytes", "0")
    val q = Stream.fromKeyedTable(oT).handleDeletes()
      .join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out").start()
    try {
      import spark.implicits._
      oT.upsert(oDf); q.processAllAvailable()
      val keys = oDf.select("o_orderkey").orderBy("o_orderkey").limit(2)
        .collect().map(_.getLong(0))
      oT.delete(Seq(keys(0)).toDF("o_orderkey")); q.processAllAvailable()
      // the first deleting batch must have built the retraction index
      val idxPath = s"$root/out/_idx/l"
      val lg = new graft.store.CommitLog(idxPath, spark.sessionState.newHadoopConf())
      assert(lg.exists, "retraction did not build the secondary index")
      val out = KeyedTable.forPath(spark, s"$root/out")
      val idx = KeyedTable.forPath(spark, idxPath)
      graft.ops.SecondaryIndex.sync(idx, out)
      // resolution = index probe: reads a few files of ONE index bucket,
      // never the output table (the old path scanned the whole snapshot)
      val resolved = graft.ops.SecondaryIndex.lookupKeys(
        idx, out, Seq(keys(1)).toDF("o_orderkey"))
      val outFiles = out.snapshot().inputFiles.length
      val probeFiles = resolved.inputFiles.length
      assert(probeFiles <= 2 && outFiles >= 10,
        s"index probe read $probeFiles files (output table has $outFiles)")
      assert(resolved.columns.toSet == out.meta.keys.toSet)
      // second wave exercises the incremental sync path end-to-end
      val before = out.snapshot().count()
      oT.delete(Seq(keys(1)).toDF("o_orderkey")); q.processAllAvailable()
      assert(KeyedTable.forPath(spark, s"$root/out").snapshot().count() == before - 1)
    } finally {
      q.stop()
      spark.conf.unset("spark.graft.retract.indexMinBytes")
    }
  }

  test("chained right-right-left with upstream-nullable keys converges, no dup rows") {
    val root = tmp()
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oDf = Tables.orders(spark, sf).select(col("o_orderkey"),
      col("o_custkey").alias("c_custkey"), col("o_totalprice"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey", "l_linenumber")
      .orderBy(col("l_quantity").desc, col("l_partkey").desc)
    val lDf = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val pDf = Tables.part(spark, sf).select("p_partkey", "p_name", "p_brand")
    val cT = KeyedTable.create(spark, s"$root/c", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val lT = KeyedTable.create(spark, s"$root/l", lDf.schema,
      Seq("o_orderkey", "l_linenumber"), numBuckets = 4)
    val pT = KeyedTable.create(spark, s"$root/p", pDf.schema, Seq("p_partkey"), numBuckets = 4)
    val pS = Stream.fromKeyedTable(pT)
      .to(df => df.withColumnRenamed("p_partkey", "part_id")).primaryKeys("part_id")
    val q = Stream.fromKeyedTable(cT)
      .join(Stream.fromKeyedTable(oT), "right").onKeys("c_custkey")
      .join(Stream.fromKeyedTable(lT), "right").onKeys("o_orderkey")
      .join(pS, "left")
      .on((l2, p) => p("part_id") === l2("l_partkey") && p("p_brand") === lit("Brand#13"))
      .writeToPath(s"$root/out").start()
    try {
      // lineitems FIRST (placeholders at every stage), then the rest late
      lT.upsert(lDf); q.processAllAvailable()
      oT.upsert(oDf); q.processAllAvailable()
      cT.upsert(cDf); pT.upsert(pDf); q.processAllAvailable()
      val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
      val pp = pDf.select(col("p_partkey").alias("part_id"), col("p_name"), col("p_brand"))
      val want = cDf.join(oDf, Seq("c_custkey"), "right")
        .join(lDf, Seq("o_orderkey"), "right")
        .join(pp, pp("part_id") === lDf("l_partkey") && pp("p_brand") === lit("Brand#13"), "left")
      val cols = got.columns.sorted.map(col).toIndexedSeq
      assert(got.count() == want.count(),
        s"row count ${got.count()} vs batch ${want.count()}")
      assert(got.select(cols: _*).exceptAll(want.select(cols: _*)).count() == 0)
      assert(want.select(cols: _*).exceptAll(got.select(cols: _*)).count() == 0)
    } finally q.stop()
  }

  test("gen() partition column is derived by the store and recorded pruned") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_orderdate")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/c", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf)
    val p = Stream.fromKeyedTable(oT)
      .join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .partitionBy(gen("o_year", "year(o_orderdate)"))
      .writeToPath(s"$root/out")
    oT.upsert(oDf.where(col("o_orderkey") % 2 === 0)); p.runAvailableNow()
    oT.upsert(oDf.where(col("o_orderkey") % 2 === 1)); p.runAvailableNow()
    val out = KeyedTable.forPath(spark, s"$root/out")
    assert(out.meta.generatedCols == Seq("o_year" -> "year(o_orderdate)"))
    assert(out.meta.prunedCols == Seq("o_year"))
    val got = out.snapshot()
    assert(got.where(col("o_year") =!= year(col("o_orderdate"))).count() == 0)
    val want = oDf.join(cDf, col("o_custkey") === col("c_custkey"))
      .withColumn("o_year", year(col("o_orderdate")))
    val cols = want.columns.sorted.map(col).toIndexedSeq
    assert(got.select(cols: _*).exceptAll(want.select(cols: _*)).count() == 0)
    assert(want.select(cols: _*).exceptAll(got.select(cols: _*)).count() == 0)
  }

  test("runAvailableNow batch-drain waves converge to the batch result") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/c", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    val p = Stream.fromKeyedTable(oT)
      .join(Stream.fromKeyedTable(cT), "left")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
    // wave 1: orders only → placeholders; wave 2: late customers +
    // more orders — each drain is a fresh availableNow run resuming
    // the same checkpoints (exactly-once across restarts)
    oT.upsert(oDf.where(col("o_orderkey") % 2 === 0)); p.runAvailableNow()
    cT.upsert(cDf)
    oT.upsert(oDf.where(col("o_orderkey") % 2 === 1)); p.runAvailableNow()
    val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
    val want = oDf.join(cDf, col("o_custkey") === col("c_custkey"), "left")
    val cols = want.columns.sorted.map(col).toIndexedSeq
    assert(got.select(cols: _*).exceptAll(want.select(cols: _*)).count() == 0)
    assert(want.select(cols: _*).exceptAll(got.select(cols: _*)).count() == 0)
  }

  test("awaitAllProcessed drains a ProcessingTime-triggered chain") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/o", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/c", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf)
    // a CHAINED pipeline (join → agg) on a real periodic trigger: the
    // drain cannot use ordered passes, it must poll progress quiescence
    val q = Stream.fromKeyedTable(oT)
      .join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("total"))
      .writeToPath(s"$root/agg")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      oT.upsert(oDf.where(col("o_orderkey") % 2 === 0))
      oT.upsert(oDf.where(col("o_orderkey") % 2 === 1))
      assert(q.awaitAllProcessed(timeoutMs = 120000L, quietMs = 1500L),
        "chain did not quiesce before timeout")
      val got = KeyedTable.forPath(spark, s"$root/agg").snapshot()
        .select(col("c_custkey"), col("cnt"), round(col("total"), 2).as("total"))
      val want = oDf.join(cDf, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("selectStar with aliased ColumnSel transform (ref select('*', col.alias))") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    val o = Stream.fromKeyedTable(oT)
    val c = Stream.fromKeyedTable(cT)
    val q = o.join(c, "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .selectStar(o("o_totalprice").to(x => round(x * 2, 2)).alias("double_price"))
      .writeToPath(s"$root/out")
      .start()
    try {
      oT.upsert(oDf, uniqueKeys = true)
      cT.upsert(cDf, uniqueKeys = true)
      q.processAllAvailable()
    } finally q.stop()
    val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
    val want = oDf.join(cDf, col("o_custkey") === col("c_custkey"))
      .withColumn("double_price", round(col("o_totalprice") * 2, 2))
    assert(got.columns.contains("double_price"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("delete then re-insert within one microbatch resolves by commit order") {
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cDf = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    val cT = KeyedTable.create(spark, s"$root/customer", cDf.schema, Seq("c_custkey"), numBuckets = 4)
    cT.upsert(cDf, uniqueKeys = true)
    val q = Stream.fromKeyedTable(oT).handleDeletes()
      .join(Stream.fromKeyedTable(cT), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
      .start()
    try {
      oT.upsert(oDf, uniqueKeys = true)                                  // commit 1
      oT.delete(oDf.where(col("o_orderkey") % 2 === 0).select("o_orderkey")) // commit 2
      oT.upsert(oDf.where(col("o_orderkey") % 4 === 0), uniqueKeys = true)   // commit 3
      q.processAllAvailable()
    } finally q.stop()
    val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
    val want = oDf.where(col("o_orderkey") % 2 =!= 0 || col("o_orderkey") % 4 === 0)
      .join(cDf, col("o_custkey") === col("c_custkey"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      s"got ${got.count()} want ${want.count()}")
  }

  test("startingVersion cuts the change feed below it (streams.py:127)") {
    // an AGG stage isolates the feed cut: it aggregates only change
    // deltas, so rows from the skipped commit must be absent from the
    // result (a JOIN stage would still see them through the other
    // side's static snapshot — that's by design, same as the reference)
    val root = tmp()
    val oDf = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val oT = KeyedTable.create(spark, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 4)
    oT.upsert(oDf.where(col("o_orderkey") % 2 === 0), uniqueKeys = true) // v1: skipped
    oT.upsert(oDf.where(col("o_orderkey") % 2 === 1), uniqueKeys = true) // v2: seen
    val q = Stream.fromKeyedTable(oT).startingVersion(1L)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
      .writeToPath(s"$root/out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = KeyedTable.forPath(spark, s"$root/out").snapshot()
      .agg(sum("cnt")).head.getLong(0)
    val want = oDf.where(col("o_orderkey") % 2 === 1).count()
    assert(got == want, s"got $got want $want (v1 rows must be skipped)")
  }

  test("drain claim: fresh intents block rivals, stale unlanded intents are adopted verbatim") {
    val dir = tmp()
    val st1 = DrainState.St(Map("src" -> 3L), next = 7L)
    assert(DrainState.beginClaim(spark, dir, st1), "first claim must win")
    assert(!DrainState.beginClaim(spark, dir, st1), "rival must lose a held claim")
    // holder alive (default grace): load must NOT surface the unlanded
    // intent as state, and the step must stay unclaimable and unadoptable
    val before = DrainState.load(spark, dir, appliedBatchId = -1L)
    assert(before.next == 0L, "unlanded fresh intent must not be visible as state")
    assert(!DrainState.beginClaim(spark, dir, st1), "grace must protect a live holder")
    assert(DrainState.staleClaim(spark, dir, appliedBatchId = -1L).isEmpty,
      "fresh claim must not be adoptable")
    // dead holder: past the (tiny) grace the intent becomes adoptable —
    // VERBATIM (same step content), never recomputed, and never deleted
    spark.conf.set("spark.graft.drain.claimGraceMs", "1")
    try {
      Thread.sleep(10)
      val adopted = DrainState.staleClaim(spark, dir, appliedBatchId = -1L)
      assert(adopted.contains(st1), "stale claim must be adoptable verbatim")
      assert(DrainState.staleClaim(spark, dir, appliedBatchId = 6L).isEmpty,
        "landed stale intent is a promotion, not an adoption")
      // the adopter re-runs the step then commits it as its own claim
      DrainState.commit(spark, dir, st1)
      val promoted = DrainState.load(spark, dir, appliedBatchId = -1L)
      assert(promoted == st1, "adopted commit must promote the claimed state")
      // the original (slow, presumed-dead but actually alive) drainer's
      // late commit of the SAME step is accepted quietly (rival landed it)
      DrainState.commit(spark, dir, st1)
      assert(DrainState.load(spark, dir, appliedBatchId = -1L) == st1)
      // but a late commit of a LOST step that nobody landed fails loudly
      // rather than corrupting drain history
      intercept[IllegalArgumentException] {
        DrainState.commit(spark, dir, DrainState.St(Map("src" -> 9L), next = 9L))
      }
    } finally spark.conf.unset("spark.graft.drain.claimGraceMs")
  }

  test("drain claim: heartbeat keeps a slow step's intent fresh under a tiny grace") {
    val dir = tmp()
    val st1 = DrainState.St(Map("src" -> 1L), next = 1L)
    spark.conf.set("spark.graft.drain.claimGraceMs", "400")
    try {
      assert(DrainState.beginClaim(spark, dir, st1))
      val hb = DrainState.heartbeat(spark, dir)
      try {
        Thread.sleep(1200) // several grace periods; heartbeat refreshes mtime
        assert(DrainState.staleClaim(spark, dir, appliedBatchId = -1L).isEmpty,
          "heartbeated claim must never go stale")
      } finally hb.close()
      Thread.sleep(600) // heartbeat stopped: claim ages out normally
      assert(DrainState.staleClaim(spark, dir, appliedBatchId = -1L).contains(st1),
        "unheartbeated claim must age out")
      DrainState.commit(spark, dir, st1)
    } finally spark.conf.unset("spark.graft.drain.claimGraceMs")
  }

  test("drain commit: landed-intent promotion never leaves state absent") {
    val dir = tmp()
    val st1 = DrainState.St(Map("src" -> 2L), next = 3L)
    DrainState.begin(spark, dir, st1)
    // merge landed (appliedBatchId >= next - 1) → load promotes atomically
    val loaded = DrainState.load(spark, dir, appliedBatchId = 2L)
    assert(loaded == st1)
    assert(DrainState.load(spark, dir, appliedBatchId = -1L) == st1,
      "promoted state must persist with the intent gone")
  }
}
