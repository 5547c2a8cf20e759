package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2 B6-B7). */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double
    * precision with deterministic left-to-right accumulation (matches
    * DuckDB's list_cosine_similarity evaluation order for the oracle).
    * Backed by the native single-pass Catalyst expression
    * [[graft.functions.CosineSimilarity]]; the composed-HOF fallback
    * below is kept for environments without a registry. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineSimilarity(a, b)

  /** Three-traversal `sql.functions` composition of the same formula —
    * identical accumulation order and results. */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** B6: brute-force cosine top-k — the exact baseline. The (small)
    * query set is broadcast against the corpus scan; ranking shuffles
    * once on query id. At 1000 executors this is a map-side join over
    * the full corpus: correct, predictable, bandwidth-bound. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vec: String = "embedding",
      id: String = "vec_id",
      k: Int = 5): DataFrame = {
    val q = broadcast(queries.select(col(id).alias("query_id"), col(vec).alias("__qv")))
    val scored = corpus.select(col(id).alias("neighbor_id"), col(vec).alias("__cv"))
      .crossJoin(q)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Deterministic pseudo-random hyperplane component for plane `p`,
    * dimension `d`: xxhash64 folded to [-0.5, 0.5). */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(1000)).cast("double") / 1000.0) - 0.5

  /** Sign-bucket of `vec` under `planes` deterministic hyperplanes —
    * an integer LSH key; cosine-close vectors land in the same bucket
    * with high probability. Pure projection, no shuffle. */
  def hyperplaneBucket(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Nearest centroid per vector: cross the (tiny, broadcast) centroid
    * table against the vectors and keep the best by cosine. The window
    * shuffles (vector, centroid) pairs on vector id; at cluster scale
    * the same argmin is one native map-side pass over a broadcast
    * centroid matrix — the shape (corpus × nlist, no corpus×corpus)
    * is what matters. */
  private def assignClusters(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("neighbor_id")
      .orderBy(col("__sim").desc, col("__cid").asc)
    vecs.crossJoin(broadcast(cents))
      .withColumn("__sim", cosine(col("__cv"), col("__cent")))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("neighbor_id"), col("__cv"), col("__cid"))
  }

  /** B7b: IVF (inverted-file) approximate top-k — the scale path when
    * hyperplane LSH recall is too coarse. Centroids are learned with a
    * few Lloyd iterations (deterministic seeding: the `nlist` lowest-id
    * vectors), the corpus is partitioned into centroid lists ONCE (one
    * shuffle), and each query probes only its `nprobe` closest lists —
    * per-query work is `nprobe/nlist` of the corpus. Queries and
    * centroids are broadcast; the corpus is never replicated.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vec: String = "embedding",
      id: String = "vec_id",
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      lloydIters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(id).alias("neighbor_id"), col(vec).alias("__cv")).cache()
    // centroids live driver-side between Lloyd iterations (nlist × dim
    // doubles — trivially small); re-literalizing them per iteration
    // keeps each assignment plan flat instead of stacking the whole
    // training lineage, and is how a real IVF index trains anyway
    def literalized(df: DataFrame): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
    var cents: DataFrame = literalized(
      c.orderBy("neighbor_id").limit(nlist)
        .withColumn("__cid",
          row_number().over(Window.orderBy("neighbor_id")).cast("int") - 1)
        .select(col("__cid"), col("__cv").cast("array<double>").alias("__cent")))
    (0 until lloydIters).foreach { _ =>
      // element-wise mean per cluster: posexplode → avg per (cluster,
      // dim) → reassemble in dimension order
      cents = literalized(assignClusters(c, cents)
        .select(col("__cid"), posexplode(col("__cv")).as(Seq("__pos", "__v")))
        .groupBy("__cid", "__pos").agg(avg("__v").alias("__m"))
        .groupBy("__cid").agg(
          transform(array_sort(collect_list(struct(col("__pos"), col("__m")))),
            s => s.getField("__m")).alias("__cent")))
    }
    val assigned = assignClusters(c, cents)
    val qProbe = queries.select(col(id).alias("query_id"), col(vec).alias("__qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__psim", cosine(col("__qv"), col("__cent")))
      .withColumn("__rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("__psim").desc, col("__cid").asc)))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("__qv"), col("__cid"))
    val scored = assigned.join(broadcast(qProbe), "__cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** B7: LSH-bucketed approximate top-k — queries join only their own
    * hyperplane bucket, so per-query work is corpus/2^planes instead of
    * the full corpus. Recall is tunable by lowering `planes` (bigger
    * buckets) or multi-probing; the exact [[bruteForceTopK]] is the
    * small-scale reference. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vec: String = "embedding",
      id: String = "vec_id",
      k: Int = 5,
      planes: Int = 4): DataFrame = {
    val cb = corpus.select(col(id).alias("neighbor_id"), col(vec).alias("__cv"))
      .withColumn("__bucket", hyperplaneBucket(col("__cv"), planes))
    val qb = broadcast(queries.select(col(id).alias("query_id"), col(vec).alias("__qv"))
      .withColumn("__bucket", hyperplaneBucket(col("__qv"), planes)))
    val scored = cb.join(qb, "__bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}
