package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{KeyedTable, MergeSpec}

/** Incrementally-maintained IVF+PQ index (SURVEY §2 B34b): the
  * compressed billion-vector ANN layout ([[ProductQuantize]]'s FAISS
  * IVFPQ shape) MATERIALIZED as a [[KeyedTable]] — the deployment form
  * of a 100 TB similarity-search corpus, where the index stores m small
  * ints + one list id per vector and is maintained by the same
  * exactly-once CDC merge machinery as every other table.
  *
  * Codebooks (coarse centroids + residual PQ sub-codebooks) are trained
  * ONCE on the seed corpus at [[build]] and FROZEN — the standard
  * production shape (FAISS trains once, adds forever): new and
  * re-embedded vectors encode against the stored books as a pure
  * projection (no shuffle) and CDC-upsert in place, so a re-embedded
  * document atomically moves lists and changes codes; deletes retract
  * through the ordinary keyed-delete path. Queries probe `nprobe`
  * lists with per-list residual ADC tables; the `list IN (...)`
  * predicate pushes into the parquet scan of the snapshot.
  *
  * Determinism mirrors [[ProductQuantize]] (lowest-id seeds,
  * engine-neutral rounding), which is what lets the driver gate replay
  * build-on-seed + frozen-book encode of the FINAL corpus as a DuckDB
  * oracle.
  */
object IvfPqIndex {

  private def coarsePath(path: String) = s"$path/_coarse"
  private def bookPath(path: String) = s"$path/_pqbook"

  /** Trains coarse + residual codebooks on `seedCorpus`, persists them
    * beside the table, and creates the index with the seed encoding. */
  def build(spark: SparkSession, path: String, seedCorpus: DataFrame,
      nlist: Int, m: Int, k: Int, iters: Int = 2,
      id: String = "vec_id", vec: String = "embedding"): KeyedTable = {
    val idx = ProductQuantize.buildIvfPq(seedCorpus, nlist, m, k, iters, id, vec)
    spark.createDataFrame(idx.coarse.zipWithIndex.map { case (v, i) => (i, v) })
      .toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(coarsePath(path))
    val bookRows = for {
      (sub, s) <- idx.book.zipWithIndex
      (cent, c) <- sub.zipWithIndex
    } yield (s, c, cent)
    spark.createDataFrame(bookRows).toDF("sub", "cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(bookPath(path))
    val kt = KeyedTable.create(spark, path, idx.encoded.schema, keys = Seq(id),
      numBuckets = 16)
    kt.upsert(idx.encoded, uniqueKeys = true)
    // the upsert materialized the seed encoding — the training pin is
    // done with (a later reader hits the stored table, not `encoded`)
    idx.pinned.foreach(_.unpersist(false))
    kt
  }

  private def loadCoarse(spark: SparkSession, path: String): Seq[Seq[Double]] =
    spark.read.parquet(coarsePath(path)).orderBy("cid")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq

  private def loadBook(spark: SparkSession, path: String): ProductQuantize.Codebook = {
    val rows = spark.read.parquet(bookPath(path)).orderBy("sub", "cid").collect()
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (_, rs) =>
      rs.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq).toSeq
    }
  }

  /** Encodes `vectors` against the FROZEN stored codebooks (list
    * assignment + residual codes, one projection) and CDC-merges them:
    * new ids insert, re-embedded ids atomically move list/codes. */
  def upsert(spark: SparkSession, path: String, vectors: DataFrame,
      id: String = "vec_id", vec: String = "embedding",
      batchId: Long = -1L): Long = {
    val coarse = loadCoarse(spark, path)
    val book = loadBook(spark, path)
    val kt = KeyedTable.forPath(spark, path)
    val assigned = vectors
      .withColumn("list", ProductQuantize.argMinDist(col(vec), coarse))
      .withColumn("__resid",
        zip_with(col(vec), element_at(typedLit(coarse), col("list") + 1),
          (x, c) => x.cast("double") - c))
    val rows = assigned
      .withColumn("codes", ProductQuantize.codesOf(col("__resid"), book))
      .select(col(id), col("list"), col("codes"))
    kt.merge(rows, MergeSpec(), uniqueKeys = true, batchId = batchId)
  }

  /** Removes vectors by id (bucket-pruned keyed delete). */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Long =
    KeyedTable.forPath(spark, path).delete(ids)

  /** Top-k by probed residual ADC over the CURRENT index snapshot —
    * the scan reads the probed lists' code rows only (`list IN`
    * pushes down), m lookups per row. */
  def query(spark: SparkSession, path: String, queryVec: Seq[Double],
      k: Int, nprobe: Int, id: String = "vec_id"): DataFrame = {
    val coarse = loadCoarse(spark, path)
    val book = loadBook(spark, path)
    val kt = KeyedTable.forPath(spark, path)
    ProductQuantize.ivfPqTopK(
      ProductQuantize.IvfPq(coarse, book, kt.snapshot()), queryVec, k, nprobe, id)
  }
}
