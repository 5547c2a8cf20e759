package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Topic clustering over an embedding corpus (SURVEY §2 B37): spherical
  * k-means (cosine metric), the workhorse behind cluster-balanced data
  * mixing — assign every document to a topic cluster, then sample
  * per-cluster quotas (B20/B31) instead of letting one dominant topic
  * swamp the mix.
  *
  * Deterministic end-to-end so the assignment carries a full DuckDB
  * oracle: seeding takes the `k` lowest-id vectors (no RNG), assignment
  * is the shuffle-free [[graft.functions.ArgMaxCosine]] projection over
  * the broadcast centroid literal (ties → lowest cluster id), and
  * updated centroid components are rounded via the engine-neutral
  * `floor(x·10⁶ + ½)/10⁶` so cross-engine summation-order drift in the
  * per-cluster mean (≈1e-15) can never flip a later argmax.
  *
  * Scale shape identical to IVF training (Similarity.ivfTopK): per
  * iteration one posexplode + (cluster, dim) avg shuffle — map-side
  * combinable, k×dim result rows to the driver (trivially small); the
  * corpus itself is never shuffled for assignment. */
object Clustering {

  private def toDoubles(r: Row): Seq[Double] =
    r.getSeq[Any](1).map {
      case f: Float  => f.toDouble
      case d: Double => d
      case n: Number => n.doubleValue()
    }.toSeq

  // engine-neutral half-up rounding (Spark round() and DuckDB round()
  // disagree on tie behavior; floor(x*1e6+0.5) is identical by
  // construction — the repo-wide convention)
  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** (id, cluster_id) after `iters` Lloyd iterations from deterministic
    * lowest-id seeds; `cluster_id` is the seed index (0 until k). */
  def kmeansAssign(
      corpus: DataFrame,
      k: Int,
      iters: Int = 2,
      id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    val c = corpus.select(col(id), col(vec).alias("__cv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cents: Seq[Seq[Double]] =
      c.orderBy(col(id)).limit(k).collect().toSeq.map(toDoubles)
    def assign(df: DataFrame): DataFrame =
      df.withColumn("__cid", graft.functions.VectorExpressions.argMaxCosine(
        col("__cv"), typedLit(cents)))
    (0 until iters).foreach { _ =>
      val byCid = assign(c)
        .select(col("__cid"), posexplode(col("__cv")).as(Seq("__pos", "__v")))
        .groupBy("__cid", "__pos").agg(avg(col("__v").cast("double")).alias("__m"))
        .collect().groupBy(_.getInt(0))
      cents = cents.indices.map { cid =>
        byCid.get(cid) match {
          case Some(rows) => rows.sortBy(_.getInt(1)).map(r => round6(r.getDouble(2))).toSeq
          case None       => cents(cid) // empty cluster keeps its centroid
        }
      }
    }
    val out = assign(c).select(col(id), col("__cid").cast("long").alias("cluster_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    c.unpersist()
    out
  }

  /** Cluster-balanced mix report: per-cluster doc counts plus the keep
    * rate a `capPerCluster` quota implies — the sizing input for a
    * balanced training mix (combine with B31 `sampleKPerGroup` on
    * `cluster_id` to materialize it). */
  def clusterSizes(assigned: DataFrame, capPerCluster: Long): DataFrame =
    assigned.groupBy("cluster_id").agg(count(lit(1)).alias("n_docs"))
      .withColumn("keep_rate",
        round(least(lit(1.0), lit(capPerCluster).cast("double") / col("n_docs")), 6))
}
