package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization (SURVEY.md §2 B30): symmetric per-vector
  * scaling to signed-byte codes — the standard memory-bandwidth lever
  * for vector search at scale (a 768-dim float32 embedding is 3 KB; its
  * int8 codes + one float scale are ~770 B, a 4× cut in scan bytes and
  * cache footprint, at <1% cosine error on unit-norm-ish vectors).
  *
  * Determinism: quantization uses `floor(x/scale + 0.5)` explicitly —
  * NOT the engine's `round`, whose half-way tie mode differs across
  * engines — so the codes are bit-reproducible in any SQL engine and
  * the gate carries a full DuckDB oracle.
  *
  * Scale shape: one projection pass (all `functions.*`, codegen'd —
  * per-row aggregate over the array, no shuffle, no UDF). Quantized
  * search ([[topK]]) is the brute-force broadcast shape of
  * [[Similarity.bruteForceTopK]] over dequantized codes; recall vs
  * exact scoring is spec-asserted.
  */
object Quantize {

  /** scale = max|x| / 127 (0 for an all-zero vector). */
  def scaleOf(vec: Column): Column =
    aggregate(vec, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0d

  /** The int8 code array for `vec` at a given scale. */
  def codesOf(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0d, lit(0))
        .otherwise(floor(x.cast("double") / scale + 0.5d)).cast("int"))

  /** Adds `scale` (double) and `qvec` (array<int> of int8-range codes)
    * per row. Codes stay in an int array column (parquet dictionary +
    * byte-packing make the storage cost equivalent; Spark has no
    * tinyint array literal ops worth fighting for here). */
  def int8(df: DataFrame, vec: String = "embedding", id: String = "vec_id"): DataFrame = {
    val s = scaleOf(col(vec))
    df.select(col(id), col(vec))
      .withColumn("scale", s)
      .withColumn("qvec", codesOf(col(vec), col("scale")))
  }

  /** Dequantized vector: code * scale. */
  def dequant(qvec: Column, scale: Column): Column =
    transform(qvec, q => q.cast("double") * scale)

  /** Brute-force top-k over DEQUANTIZED codes — the compressed-scoring
    * path: the scan ships int8 codes, not floats; scoring reconstructs
    * on the fly. Same broadcast-queries map-side shape as
    * [[Similarity.bruteForceTopK]]; ranks tie-break on id. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      vec: String = "embedding", id: String = "vec_id"): DataFrame = {
    val cq = int8(corpus, vec, id)
      .select(col(id).alias("neighbor_id"), dequant(col("qvec"), col("scale")).alias("cv"))
    val qq = broadcast(queries.select(col(id).alias("query_id"), col(vec).alias("qv")))
    val scored = qq.crossJoin(cq)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(Similarity.cosine(col("qv"), col("cv")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}
