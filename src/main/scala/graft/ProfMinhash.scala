package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing of the minhash-LSH pipeline. */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val df = Tables.documents(spark, sfDir)
    val id = "doc_id"; val n = 3; val numHashes = 64; val bands = 16
    val rows = numHashes / bands
    val base = df.select(col(id), col("text"))
      .withColumn("__sh", graft.ops.Shingles.wordShingles(col("text"), n))
      .withColumn("__bh", transform(col("__sh"), s => xxhash64(s)))
      .cache()
    t("base")(base.count())
    val sigd = base
      .withColumn("__sig", graft.ops.Dedup.minhashSignature(col("__bh"), numHashes))
      .select(col(id), col("__sig"))
      .cache()
    t("sigd")(sigd.count())
    val banded = sigd.select(col(id), explode(array((0 until bands).map { b =>
      struct(lit(b).alias("band"),
        xxhash64((0 until rows).map(r => element_at(col("__sig"), b * rows + r + 1)) :+ lit(b): _*)
          .alias("bhash"))
    }: _*)).alias("bk")).select(col(id), col("bk.band"), col("bk.bhash"))
    val cand = banded.alias("x").join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").alias("id_a"), col(s"y.$id").alias("id_b"))
      .distinct().cache()
    t("cand")(println("  cand=" + cand.count()))
    val estFiltered = cand
      .join(sigd.select(col(id).alias("id_a"), col("__sig").alias("__siga")), "id_a")
      .join(sigd.select(col(id).alias("id_b"), col("__sig").alias("__sigb")), "id_b")
      .withColumn("__est",
        size(filter(zip_with(col("__siga"), col("__sigb"),
          (x, y) => (x === y).cast("int")), v => v === 1)).cast("double") / numHashes)
      .where(col("__est") >= 0.45)
      .select("id_a", "id_b").cache()
    t("est")(println("  est=" + estFiltered.count()))
    val v = estFiltered
      .join(base.select(col(id).alias("id_a"), col("__sh").alias("__sa")), "id_a")
      .join(base.select(col(id).alias("id_b"), col("__sh").alias("__sb")), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("__sa"), col("__sb"))).cast("double") /
          size(array_union(col("__sa"), col("__sb"))), 4))
      .where(col("jaccard") >= 0.5)
    t("verify")(println("  pairs=" + v.count()))
    spark.stop()
  }
}
