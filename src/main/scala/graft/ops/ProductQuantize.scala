package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for embedding corpora (SURVEY §2 B30, the
  * codebook half of the standing PQ item; cf. Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * The vector splits into `m` sub-vectors; each sub-space trains its
  * own `k`-centroid codebook and a vector stores only the m centroid
  * ids — 64-dim float32 at m=8 becomes 8 single-byte codes, a 32×
  * storage/scan cut. Queries score against codes with an asymmetric
  * distance computation (ADC): per query, the m×k table of
  * sub-distances is precomputed and scoring a code is m lookups — no
  * reconstruction of corpus vectors at scan time.
  *
  * Determinism mirrors [[Clustering.kmeansAssign]]: sub-codebooks seed
  * from the `k` lowest-id vectors (no RNG), Lloyd updates round via the
  * engine-neutral `floor(x·10⁶+½)/10⁶`, assignment ties take the lowest
  * centroid id. No UDFs anywhere: assignment and ADC are composed
  * `functions.*` expressions (whole-stage codegen), so the scan side is
  * a shuffle-free projection.
  *
  * Scale shape: training shuffles (sub, cid, pos)-grouped means — the
  * same map-side-combinable aggregate as IVF/k-means training — and
  * collects only m×k×(d/m) doubles to the driver. Encoding and ADC
  * scoring are per-row projections over a broadcast-literal codebook;
  * the corpus is never shuffled or cross-joined.
  */
object ProductQuantize {

  /** codebook(sub)(cid) = centroid components (length d/m). */
  type Codebook = Seq[Seq[Seq[Double]]]

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Index of the nearest centroid by squared L2 (ties → lowest id):
    * the native [[graft.functions.ArgMinL2]] expression over a 2-D
    * centroid literal — ONE plan node and one fused per-row loop (r16),
    * replacing k inlined aggregate(zip_with(...)) distance trees whose
    * analysis/codegen dominated the small-corpus gates and whose
    * interpreted HOF eval cost k separate array traversals per row at
    * scale. Arithmetic (element order, cast, tie-break, NaN ordering)
    * is reproduced exactly — results bit-equal, oracle-stable. */
  private[ops] def argMinDist(sub: Column, cents: Seq[Seq[Double]]): Column =
    graft.functions.VectorExpressions.argMinL2(sub, typedLit(cents))

  private def subCol(vec: Column, s: Int, subDim: Int): Column =
    slice(vec, s * subDim + 1, subDim)

  /** Trains the m sub-codebooks with `iters` Lloyd iterations from
    * lowest-id seeds. Requires dim % m == 0. */
  def train(corpus: DataFrame, m: Int, k: Int, iters: Int = 2,
      id: String = "vec_id", vec: String = "embedding"): Codebook = {
    require(m > 0 && k > 0 && iters >= 0, "m, k, iters must be positive")
    val seeds = corpus.orderBy(col(id)).limit(k)
      .select(col(vec)).collect().map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }.toSeq)
    // dim from the seed collect — one fewer driver job than a separate
    // size() head (every action here re-plans the full assignment tree)
    val dim = seeds.head.size
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    var book: Codebook = (0 until m).map(s =>
      seeds.toSeq.map(v => v.slice(s * subDim, (s + 1) * subDim)))
    (0 until iters).foreach { _ =>
      // one job updates EVERY sub-space: explode to (sub, cid, pos, v)
      // and take grouped means — map-side combinable, m×k×subDim rows out
      val assigned = corpus.select(
        posexplode(array((0 until m).map { s =>
          struct(
            argMinDist(subCol(col(vec), s, subDim), book(s)).alias("cid"),
            subCol(col(vec), s, subDim).alias("sv"))
        }: _*)).as(Seq("sub", "a")))
      val means = assigned
        .select(col("sub"), col("a.cid").alias("cid"),
          posexplode(col("a.sv")).as(Seq("pos", "v")))
        .groupBy("sub", "cid", "pos")
        .agg(avg(col("v").cast("double")).alias("mv"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
      book = (0 until m).map { s =>
        (0 until k).map { cid =>
          means.get((s, cid)) match {
            case Some(rows) =>
              rows.sortBy(_.getInt(2)).map(r => round6(r.getDouble(3))).toSeq
            case None => book(s)(cid) // empty cell keeps its centroid
          }
        }
      }
    }
    book
  }

  /** Per-row code array (length m) for a trained codebook. */
  def codesOf(vec: Column, book: Codebook): Column = {
    val subDim = book.head.head.size
    array(book.indices.map(s =>
      argMinDist(subCol(vec, s, subDim), book(s))): _*)
  }

  /** The PQ-reconstructed vector of a code array: concatenated centroid
    * components — the decode side of the codec. */
  def reconstruct(codes: Column, book: Codebook): Column =
    flatten(array(book.indices.map { s =>
      // element_at on a literal array of centroid arrays: one lookup
      element_at(typedLit(book(s)), codes.getItem(s) + 1)
    }: _*))

  /** Encodes the corpus: (id, codes array<int>, recon_err double) —
    * recon_err is the L2 distance to the reconstruction, the quality
    * number a pipeline monitors when sizing m/k. */
  def encode(corpus: DataFrame, book: Codebook,
      id: String = "vec_id", vec: String = "embedding"): DataFrame =
    corpus
      .withColumn("codes", codesOf(col(vec), book))
      .withColumn("recon_err", round(
        sqrt(aggregate(
          zip_with(reconstruct(col("codes"), book), col(vec),
            (r, x) => { val d = r - x.cast("double"); d * d }),
          lit(0.0d), (a, x) => a + x)), 4))
      .select(col(id), col("codes"), col("recon_err"))

  /** ADC squared distance of a LITERAL query against a code column:
    * the query's m×k sub-distance table is precomputed driver-side and
    * scoring is m literal-array lookups per row. */
  def adcDist(codes: Column, query: Seq[Double], book: Codebook): Column = {
    val subDim = book.head.head.size
    val tables: Seq[Seq[Double]] = book.indices.map { s =>
      val q = query.slice(s * subDim, (s + 1) * subDim)
      book(s).map(c => c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    tables.indices.map(s =>
      element_at(typedLit(tables(s)), codes.getItem(s) + 1))
      .reduce(_ + _)
  }

  /** Top-k nearest corpus codes to `query` by ADC — the compressed
    * search path: the scan reads m small ints per row, never a float
    * vector. */
  def adcTopK(encoded: DataFrame, query: Seq[Double], book: Codebook,
      k: Int, id: String = "vec_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("adc"), col(id))
    encoded
      .withColumn("adc", round(adcDist(col("codes"), query, book), 6))
      .orderBy(col("adc"), col(id)).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col(id).alias("neighbor_id"), col("rank"), col("adc"))
  }

  // --- IVF+PQ (the FAISS IVFPQ architecture, Jégou et al. 2011 §V) ------

  /** A built IVF+PQ index: coarse centroids, the residual codebook, and
    * the encoded corpus (id, list, codes) — at 100 TB this is what a
    * stored ANN index holds: m bytes + one small int per vector.
    * `pinned` is the residual frame [[buildIvfPq]] persisted for the
    * training passes; callers that materialize `encoded` elsewhere
    * (e.g. [[graft.ops.IvfPqIndex.build]]) release it afterwards. */
  final case class IvfPq(coarse: Seq[Seq[Double]], book: Codebook,
      encoded: DataFrame, pinned: Option[DataFrame] = None)

  /** Builds the index: L2 coarse assignment into `nlist` lists
    * (deterministic lowest-id seeds + Lloyd), PQ codebook trained on
    * RESIDUALS (vector − list centroid — residuals concentrate near 0,
    * so the same k sub-centroids quantize far finer than raw vectors).
    * One coarse-train pass + one PQ-train pass + one encode projection;
    * the corpus is never cross-joined. */
  def buildIvfPq(corpus: DataFrame, nlist: Int, m: Int, k: Int,
      iters: Int = 2, id: String = "vec_id", vec: String = "embedding")
      : IvfPq = {
    require(nlist > 0, "nlist must be positive")
    val seeds = corpus.orderBy(col(id)).limit(nlist)
      .select(col(vec)).collect().map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }.toSeq)
    var coarse: Seq[Seq[Double]] = seeds.toSeq
    def withList(df: DataFrame): DataFrame =
      df.withColumn("__list", argMinDist(col(vec), coarse))
    (0 until iters).foreach { _ =>
      val means = withList(corpus)
        .select(col("__list"), posexplode(col(vec)).as(Seq("__pos", "__v")))
        .groupBy("__list", "__pos").agg(avg(col("__v").cast("double")).alias("__m"))
        .collect().groupBy(_.getInt(0))
      coarse = coarse.indices.map { cid =>
        means.get(cid) match {
          case Some(rows) =>
            rows.sortBy(_.getInt(1)).map(r => round6(r.getDouble(2))).toSeq
          case None => coarse(cid)
        }
      }
    }
    // persist the residual frame: PQ training runs 2+iters actions over
    // it (seed collect + one grouped-means collect per Lloyd iteration)
    // and the encode projection reads it once more — unpersisted, every
    // one of those jobs recomputes AND re-codegens the coarse
    // argMinDist assignment (nlist × dim expression tree), which
    // dominates this op at any corpus size since the data per row is
    // tiny (guide §7.3: planning/codegen of large expression trees).
    // Released by the caller's normal gate teardown once `encoded` has
    // been consumed (the bench sweeps persistent RDDs between gates).
    val resid = withList(corpus).withColumn("__resid",
      zip_with(col(vec), element_at(typedLit(coarse), col("__list") + 1),
        (x, c) => x.cast("double") - c))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val book = train(resid, m, k, iters, id, "__resid")
    val encoded = resid
      .withColumn("codes", codesOf(col("__resid"), book))
      .select(col(id), col("__list").alias("list"), col("codes"))
    IvfPq(coarse, book, encoded, pinned = Some(resid))
  }

  /** Top-k by IVF+PQ: the query probes its `nprobe` nearest lists and
    * ADC-scores only their codes — per probed list the lookup table is
    * built from the query's RESIDUAL against that list's centroid, so
    * the same codes mean different distances per list, exactly the
    * IVFPQ asymmetric form. Scan cost: codes of nprobe/nlist of the
    * corpus, m lookups per row. */
  def ivfPqTopK(index: IvfPq, query: Seq[Double], k: Int, nprobe: Int,
      id: String = "vec_id"): DataFrame = {
    val probed = index.coarse.zipWithIndex
      .map { case (c, i) =>
        (c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }
      .sorted.take(math.min(nprobe, index.coarse.size)).map(_._2)
    // per-list ADC: chained CASE over the (small) probed set
    val adc = probed.tail.foldLeft(
      when(col("list") === probed.head,
        adcDist(col("codes"),
          query.zip(index.coarse(probed.head)).map { case (q, c) => q - c },
          index.book))) { (acc, l) =>
      acc.when(col("list") === l,
        adcDist(col("codes"),
          query.zip(index.coarse(l)).map { case (q, c) => q - c },
          index.book))
    }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("adc"), col(id))
    index.encoded
      .where(col("list").isin(probed.map(Integer.valueOf): _*))
      .withColumn("adc", round(adc, 6))
      .orderBy(col("adc"), col(id)).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col(id).alias("neighbor_id"), col("rank"), col("adc"))
  }
}
