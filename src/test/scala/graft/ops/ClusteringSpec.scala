package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("every vector gets exactly one cluster in [0, k); deterministic") {
    val e = Tables.embeddings(spark, sf)
    val total = e.count()
    val a = Clustering.kmeansAssign(e, k = 8, iters = 2)
    assert(a.count() == total)
    val ids = a.select("cluster_id").distinct().collect().map(_.getLong(0))
    assert(ids.forall(c => c >= 0 && c < 8), s"cluster ids out of range: ${ids.toSeq}")
    val b = Clustering.kmeansAssign(e, k = 8, iters = 2)
    assert(a.orderBy("vec_id").collect().toSeq == b.orderBy("vec_id").collect().toSeq)
    a.unpersist(); b.unpersist()
  }

  test("iterations improve cohesion: labels beat a degenerate 1-cluster split") {
    // embeddings carry a planted label column — k-means at k=#labels
    // should produce clusters that are label-purer than random
    val e = Tables.embeddings(spark, sf)
    val k = e.select(max("label")).collect().head.getInt(0) + 1
    val a = Clustering.kmeansAssign(e, k = k, iters = 3)
    val joined = a.join(e.select("vec_id", "label"), "vec_id")
    // majority-label purity per cluster
    val purity = joined.groupBy("cluster_id", "label").count()
      .groupBy("cluster_id").agg(max("count").alias("maj"), sum("count").alias("n"))
      .agg(sum("maj").cast("double") / sum("n")).collect().head.getDouble(0)
    val nLabels = e.select("label").distinct().count().toDouble
    assert(purity > 1.5 / nLabels,
      s"purity $purity no better than chance ${1.0 / nLabels}")
    a.unpersist()
  }

  test("clusterSizes reports counts and a capped keep rate") {
    val e = Tables.embeddings(spark, sf)
    val a = Clustering.kmeansAssign(e, k = 4, iters = 1)
    val sizes = Clustering.clusterSizes(a, capPerCluster = 10L).collect()
    assert(sizes.map(_.getLong(1)).sum == e.count())
    sizes.foreach { r =>
      val (n, rate) = (r.getLong(1), r.getDouble(2))
      assert(rate <= 1.0 + 1e-9 && rate > 0)
      if (n > 10) assert(math.abs(rate - 10.0 / n) < 1e-5)
    }
    a.unpersist()
  }
}
