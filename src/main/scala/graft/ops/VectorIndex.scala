package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.store.{KeyedTable, MergeSpec}

/** Incrementally-maintained IVF vector index (SURVEY.md §2 B34): the
  * inverted-file ANN index MATERIALIZED as a [[KeyedTable]], so the
  * corpus of a similarity-search deployment is maintained by the same
  * exactly-once CDC merge machinery as every other table — new and
  * updated vectors upsert in place (a re-embedded document simply moves
  * to its new list), deletes retract, and the index never rebuilds.
  *
  * Layout: rows (id, cluster, embedding) keyed by id (update-friendly
  * hash-bucketing); centroids are trained once at [[build]] (Lloyd on
  * the seed corpus, deterministic lowest-id seeding) and persisted
  * beside the table — nlist × dim doubles, trivially small. Cluster
  * assignment is the shuffle-free native `ArgMaxCosine` projection over
  * the broadcast centroid literal (same as [[Similarity.ivfTopK]]), so
  * an upsert's only cost is the merge itself.
  *
  * Queries probe the `nprobe` closest lists: the snapshot scan carries
  * a pushed-down `cluster IN (...)` predicate (row-group pruning; a
  * 100 TB deployment would additionally lay lists out via
  * `partitionBy(cluster)` table partitioning). At `nprobe = nlist` the
  * result provably equals brute force — which is how the gate carries a
  * full oracle.
  */
object VectorIndex {

  private def centroidsPath(path: String) = s"$path/_centroids"

  /** Trains centroids on `seedCorpus` and creates the index table with
    * the seed vectors. */
  def build(spark: SparkSession, path: String, seedCorpus: DataFrame,
      vec: String = "embedding", id: String = "vec_id",
      nlist: Int = 16, lloydIters: Int = 2): KeyedTable = {
    val c = seedCorpus.select(col(id), col(vec)).cache()
    def toDoubles(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }.toSeq
    var cents: Seq[Seq[Double]] =
      c.orderBy(id).limit(nlist).collect().toSeq.map(toDoubles)
    def assign(vecs: DataFrame): DataFrame =
      vecs.withColumn("cluster", graft.functions.VectorExpressions.argMaxCosine(
        col(vec), typedLit(cents)))
    (0 until lloydIters).foreach { _ =>
      val byCid = assign(c)
        .select(col("cluster"), posexplode(col(vec)).as(Seq("__pos", "__v")))
        .groupBy("cluster", "__pos").agg(avg("__v").alias("__m"))
        .collect().groupBy(_.getInt(0))
      cents = cents.indices.map { cid =>
        byCid.get(cid) match {
          case Some(rows) => rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          case None => cents(cid)
        }
      }
    }
    // persist centroids beside the table (readable by any engine)
    spark.createDataFrame(cents.zipWithIndex.map { case (v, i) => (i, v) })
      .toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath(path))
    val rows = assign(c).select(col(id), col("cluster"), col(vec))
    val kt = KeyedTable.create(spark, path, rows.schema, keys = Seq(id),
      numBuckets = 16)
    kt.upsert(rows, uniqueKeys = true)
    c.unpersist()
    kt
  }

  private def loadCentroids(spark: SparkSession, path: String): Seq[Seq[Double]] =
    spark.read.parquet(centroidsPath(path))
      .orderBy("cluster").collect()
      .map(_.getSeq[Double](1).toSeq).toSeq

  /** Upserts new/changed vectors: assignment is the same shuffle-free
    * projection against the STORED centroids, then one exactly-once
    * CDC merge (an updated vector replaces its row — and thereby moves
    * lists — atomically). */
  def upsert(spark: SparkSession, path: String, vectors: DataFrame,
      vec: String = "embedding", id: String = "vec_id",
      batchId: Long = -1L): Long = {
    val cents = loadCentroids(spark, path)
    val kt = KeyedTable.forPath(spark, path)
    val rows = vectors.select(col(id), col(vec))
      .withColumn("cluster", graft.functions.VectorExpressions.argMaxCosine(
        col(vec), typedLit(cents)))
      .select(col(id), col("cluster"), col(vec))
    kt.merge(rows, MergeSpec(), uniqueKeys = true, batchId = batchId)
  }

  /** Top-k over the `nprobe` closest lists per query. */
  def query(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int,
      vec: String = "embedding", id: String = "vec_id"): DataFrame = {
    val cents = loadCentroids(spark, path)
    val kt = KeyedTable.forPath(spark, path)
    val qProbe = queries.select(col(id).alias("query_id"), col(vec).alias("__qv"))
      .select(col("query_id"), col("__qv"),
        posexplode(typedLit(cents)).as(Seq("cluster", "__cent")))
      .withColumn("__psim", Similarity.cosine(col("__qv"), col("__cent")))
      .withColumn("__rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("__psim").desc, col("cluster").asc)))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cluster"))
    // the union of probed lists across the query set, as a pushed-down
    // scan predicate (tiny collect: ≤ nlist ints) — row groups of
    // unprobed lists never decompress
    val probed = qProbe.select("cluster").distinct().collect().map(_.getInt(0)).toSeq
    val lists = kt.snapshot()
      .select(col(id).alias("neighbor_id"), col("cluster"), col(vec).alias("__cv"))
      .where(col("cluster").isin(probed: _*))
    val scored = lists.join(broadcast(qProbe), "cluster")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(Similarity.cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}
