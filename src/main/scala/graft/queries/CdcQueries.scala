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
    val q = Stream.fromKeyedTable(oT, maxFilesPerTrigger = 64)
      .join(Stream.fromKeyedTable(cT, maxFilesPerTrigger = 64), "left")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
      .start()
    try {
      oT.upsert(oDf.where(col("o_orderkey") % 2 === 0), uniqueKeys = true)
      q.processAllAvailable()
      cT.upsert(cDf, uniqueKeys = true) // late right side: placeholders upgrade
      oT.upsert(oDf.where(col("o_orderkey") % 2 === 1), uniqueKeys = true)
      q.processAllAvailable()
    } finally q.stop()
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
    val q = Stream.fromKeyedTable(lT, maxFilesPerTrigger = 64)
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("total_qty"), count(lit(1)).as("cnt"),
        avg("l_quantity").as("avg_qty"))
      .reduce("avg_qty", update =
        (col("u.total_qty") + col("s.total_qty")) / (col("u.cnt") + col("s.cnt")))
      .writeToPath(s"$root/agg")
      .start()
    try {
      lT.upsert(lDf.where(col("l_orderkey") % 2 === 0), uniqueKeys = true); q.processAllAvailable()
      lT.upsert(lDf.where(col("l_orderkey") % 2 === 1), uniqueKeys = true); q.processAllAvailable()
      lT.upsert(lDf.where(col("l_orderkey") % 7 === 0)
        .withColumn("l_quantity", col("l_quantity") * 3), uniqueKeys = true)
      q.processAllAvailable()
    } finally q.stop()
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
    val q = Stream.fromKeyedTable(oT, maxFilesPerTrigger = 64).handleDeletes()
      .join(Stream.fromKeyedTable(cT, maxFilesPerTrigger = 64), "inner")
      .on((l, r) => l("o_custkey") === r("c_custkey"))
      .writeToPath(s"$root/out")
      .start()
    try {
      oT.upsert(oDf, uniqueKeys = true)
      q.processAllAvailable()
      oT.delete(oDf.where(col("o_orderkey") % 4 === 0).select("o_orderkey"))
      q.processAllAvailable()
    } finally q.stop()
    KeyedTable.forPath(s, s"$root/out").snapshot()
  }

  /** Delete retraction through an incremental aggregation: after the
    * delete commit the running (sum, count) must equal the aggregate
    * of the surviving rows only. */
  def cdcAggDeleteRetract(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Stream
    val root = freshDir()
    val oDf = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val oT = KeyedTable.create(s, s"$root/orders", oDf.schema, Seq("o_orderkey"), numBuckets = 8)
    val q = Stream.fromKeyedTable(oT, maxFilesPerTrigger = 64).handleDeletes()
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("total"))
      .writeToPath(s"$root/agg")
      .start()
    try {
      oT.upsert(oDf, uniqueKeys = true)
      q.processAllAvailable()
      oT.delete(oDf.where(col("o_orderkey") % 4 === 0).select("o_orderkey"))
      q.processAllAvailable()
    } finally q.stop()
    KeyedTable.forPath(s, s"$root/agg").snapshot()
      .select(col("o_orderstatus"), col("cnt"),
        col("total").cast("decimal(18,2)").as("total"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_time_travel" -> (cdcTimeTravel _),
    "cdc_changes_since" -> (cdcChangesSince _),
    "table_catalog_sql" -> (tableCatalogSql _),
    "cdc_delete_propagation" -> (cdcDeletePropagation _),
    "cdc_agg_delete_retract" -> (cdcAggDeleteRetract _),
    "cdc_join_incremental" -> (cdcJoinIncremental _),
    "cdc_agg_reduce_incremental" -> (cdcAggReduceIncremental _),
    "cdc_upsert_snapshot" -> (cdcUpsertSnapshot _),
    "cdc_seq_latest_wins" -> (cdcSeqLatestWins _),
    "cdc_agg_incremental" -> (cdcAggIncremental _))

  val oracleSql: Map[String, String] = Map(
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
    "cdc_agg_delete_retract" ->
      """SELECT o_orderstatus, count(*) AS cnt,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS total
         FROM orders WHERE o_orderkey % 4 <> 0
         GROUP BY o_orderstatus""",
    "cdc_join_incremental" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_custkey, c_name
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey""",
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
