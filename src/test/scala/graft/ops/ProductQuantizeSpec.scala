package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Product quantization (B30's codebook half): deterministic training,
  * the ADC-equals-reconstruction identity, and compressed-search
  * behavior on planted near-duplicates.
  */
class ProductQuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def corpus = graft.Tables.embeddings(spark, sf)

  test("training and encoding are deterministic") {
    val b1 = ProductQuantize.train(corpus, m = 8, k = 16, iters = 2)
    val b2 = ProductQuantize.train(corpus, m = 8, k = 16, iters = 2)
    assert(b1 == b2)
    val c1 = ProductQuantize.encode(corpus, b1).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val c2 = ProductQuantize.encode(corpus, b2).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(c1.sameElements(c2))
  }

  test("ADC distance equals exact distance to the reconstruction") {
    val book = ProductQuantize.train(corpus, m = 8, k = 16, iters = 1)
    val enc = ProductQuantize.encode(corpus, book)
    val q = corpus.orderBy("vec_id").select("embedding").head
      .getSeq[Any](0).map(_.asInstanceOf[Float].toDouble).toSeq
    // adcDist looks up precomputed sub-tables; the identity says that
    // MUST equal the plain L2² between query and reconstructed vector
    val both = enc
      .withColumn("adc", ProductQuantize.adcDist(col("codes"), q, book))
      .withColumn("exact", aggregate(
        zip_with(ProductQuantize.reconstruct(col("codes"), book),
          typedLit(q), (r, x) => { val d = r - x; d * d }),
        lit(0.0d), (a, x) => a + x))
      .select(max(abs(col("adc") - col("exact")))).head.getDouble(0)
    assert(both < 1e-6, s"ADC diverges from reconstruction distance: $both")
  }

  test("Lloyd iterations do not worsen reconstruction error") {
    val seeded = ProductQuantize.train(corpus, m = 8, k = 16, iters = 0)
    val trained = ProductQuantize.train(corpus, m = 8, k = 16, iters = 2)
    def meanErr(b: ProductQuantize.Codebook): Double =
      ProductQuantize.encode(corpus, b)
        .select(avg("recon_err")).head.getDouble(0)
    val (e0, e2) = (meanErr(seeded), meanErr(trained))
    assert(e2 <= e0 + 1e-9, s"training worsened reconstruction: $e0 -> $e2")
  }

  test("plan shapes: encode never shuffles; IVFPQ search is a bounded top-k") {
    val book = ProductQuantize.train(corpus, m = 8, k = 16, iters = 0)
    val encPlan = ProductQuantize.encode(corpus, book)
      .queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"),
      s"encode shuffles the corpus:\n${encPlan.take(500)}")
    val idx = ProductQuantize.buildIvfPq(corpus, nlist = 8, m = 8, k = 16,
      iters = 0)
    val q = (0 until 64).map(_ * 0.01)
    val sp = ProductQuantize.ivfPqTopK(idx, q, 10, 2)
      .queryExecution.executedPlan.toString
    // distributed top-k over the probed lists; the only post-scan work
    // beyond it is the rank window over ≤k survivors — never a join or
    // a corpus-wide sort
    assert(sp.contains("TakeOrderedAndProject"), s"no top-k:\n${sp.take(500)}")
    assert(!sp.contains("Join") && !sp.contains("CartesianProduct"),
      s"search joins the corpus:\n${sp.take(500)}")
  }

  test("IVFPQ: residual coding reconstructs no worse than raw PQ") {
    val idx = ProductQuantize.buildIvfPq(corpus, nlist = 8, m = 8, k = 16,
      iters = 2)
    val rawBook = ProductQuantize.train(corpus, m = 8, k = 16, iters = 2)
    val rawErr = ProductQuantize.encode(corpus, rawBook)
      .select(avg("recon_err")).head.getDouble(0)
    val ivfErr = idx.encoded.join(corpus, "vec_id")
      .withColumn("recon", zip_with(
        ProductQuantize.reconstruct(col("codes"), idx.book),
        element_at(typedLit(idx.coarse), col("list") + 1), (r, c) => r + c))
      .withColumn("err", sqrt(aggregate(
        zip_with(col("recon"), col("embedding"),
          (r, x) => { val d = r - x.cast("double"); d * d }),
        lit(0.0d), (a, x) => a + x)))
      .select(avg("err")).head.getDouble(0)
    assert(ivfErr <= rawErr + 1e-9,
      s"residual coding worse than raw PQ: $ivfErr vs $rawErr")
  }

  test("IVFPQ: planted near-duplicate recovered through probed lists") {
    val base = corpus.limit(200)
    val dup = base.where(col("vec_id") === 7L)
      .select((col("vec_id") + 100000L).alias("vec_id"),
        transform(col("embedding"), x => x + lit(1e-4f)).alias("embedding"))
    val all = base.select("vec_id", "embedding").unionByName(dup)
    val idx = ProductQuantize.buildIvfPq(all, nlist = 8, m = 8, k = 16,
      iters = 2)
    val q = all.where(col("vec_id") === 100007L).select("embedding").head
      .getSeq[Any](0).map(_.asInstanceOf[Float].toDouble).toSeq
    val top = ProductQuantize.ivfPqTopK(
        idx.copy(encoded = idx.encoded.where(col("vec_id") =!= 100007L)),
        q, k = 3, nprobe = 2)
      .select("neighbor_id").as[Long].collect()
    assert(top.contains(7L),
      s"near-dup's original not in IVFPQ top-3: ${top.mkString(",")}")
  }

  test("a planted near-duplicate is recovered by compressed ADC search") {
    val base = corpus.limit(200)
    val dup = base.where(col("vec_id") === 7L)
      .select((col("vec_id") + 100000L).alias("vec_id"),
        transform(col("embedding"), x => x + lit(1e-4f)).alias("embedding"))
    val all = base.select("vec_id", "embedding").unionByName(dup)
    val book = ProductQuantize.train(all, m = 8, k = 16, iters = 2)
    val enc = ProductQuantize.encode(all, book)
    val q = all.where(col("vec_id") === 100007L).select("embedding").head
      .getSeq[Any](0).map(_.asInstanceOf[Float].toDouble).toSeq
    val top = ProductQuantize.adcTopK(
        enc.where(col("vec_id") =!= 100007L), q, book, k = 3)
      .select("neighbor_id").as[Long].collect()
    assert(top.contains(7L),
      s"near-dup's original not in ADC top-3: ${top.mkString(",")}")
  }
}
