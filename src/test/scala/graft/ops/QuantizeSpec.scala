package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("codes stay in int8 range and dequantization error is within scale/2") {
    val q = Quantize.int8(graft.Tables.embeddings(spark, sf))
    val checked = q.select(
      array_min(col("qvec")).alias("mn"), array_max(col("qvec")).alias("mx"),
      aggregate(zip_with(col("embedding"), Quantize.dequant(col("qvec"), col("scale")),
          (x, d) => abs(x.cast("double") - d)),
        lit(0.0d), (a, e) => greatest(a, e)).alias("maxErr"),
      col("scale"))
    val bad = checked.where(col("mn") < -127 || col("mx") > 127 ||
      col("maxErr") > col("scale") * 0.5 + 1e-12).count()
    assert(bad == 0)
  }

  test("quantized top-k matches exact brute-force top-k on this corpus") {
    val e = graft.Tables.embeddings(spark, sf)
    val queries = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, queries, k = 5)
      .select("query_id", "neighbor_id")
    val quant = Quantize.topK(e, queries, k = 5)
      .select("query_id", "neighbor_id")
    val recall = quant.intersect(exact).count().toDouble / exact.count()
    assert(recall >= 0.95, s"int8 scoring recall $recall")
  }

  test("IVF with int8 candidate scoring keeps brute-force-level recall") {
    val e = graft.Tables.embeddings(spark, sf)
    val queries = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, queries, k = 5)
      .select("query_id", "neighbor_id")
    val quant = Similarity.ivfTopK(e, queries, k = 5, nlist = 8, nprobe = 8,
        quantizedScoring = true)
      .select("query_id", "neighbor_id")
    val recall = quant.intersect(exact).count().toDouble / exact.count()
    assert(recall >= 0.95, s"quantized IVF recall $recall")
  }
}
