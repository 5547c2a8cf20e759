package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage wall-clock of the simhash near-dup
  * pipeline — signature pass, candidate join (pre/post hamming), exact
  * verify — to attribute its cost at a given scale.
  *
  * {{{ sbt "runMain graft.ProfDedup /tmp/sf1" }}}
  */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "24g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir).cache()
    println(s"[prof] docs=${docs.count()}")
    val sigs = t("sig")(graft.ops.Dedup.simhash(docs).cache())
    println(s"[prof] sigs=${sigs.count()}")
    // dump (doc_id, simhash) for the windowed sf1 oracle's hamming
    // filter (tools/sf1_dedup_oracle.py --sigs): the signature VALUES
    // are spec-pinned bit-equal to the shuffle formulation, so the
    // oracle may use them to recompute the engine's hamming radius
    args.find(_.startsWith("sigsOut=")).map(_.stripPrefix("sigsOut=")).foreach { p =>
      sigs.coalesce(1).write.mode("overwrite").parquet(p)
      println(s"[prof] sigs written to $p")
    }
    // two-level bucket occupancy: the join's worst key drives its
    // worst task (output grows with occupancy²)
    t("occupancy") {
      val chunkBits = 8
      val nChunks = 64 / chunkBits
      val subBits = (64 - chunkBits) / nChunks
      val occ = sigs.select(explode(array(
        (for { c <- 0 until nChunks; j <- 0 until nChunks } yield {
          val lowBits = c * chunkBits
          val lower = if (lowBits == 0) lit(0L)
            else col("simhash").bitwiseAND((1L << lowBits) - 1)
          val upper = if ((c + 1) * chunkBits >= 64) lit(0L)
            else shiftleft(shiftrightunsigned(col("simhash"), (c + 1) * chunkBits), lowBits)
          val comp = lower.bitwiseOR(upper)
          struct(lit(c).alias("c"), lit(j).alias("j"),
            shiftrightunsigned(col("simhash"), c * chunkBits)
              .bitwiseAND((1L << chunkBits) - 1).alias("ck"),
            shiftrightunsigned(comp, j * subBits)
              .bitwiseAND((1L << subBits) - 1).alias("sk"))
        }): _*)).alias("e"))
        .groupBy("e").agg(count(lit(1)).alias("n"))
      occ.select(sum(col("n") * (col("n") - 1) / 2).alias("pairs"),
        max("n").alias("maxOcc")).show(false)
      occ.orderBy(col("n").desc).show(5, false)
    }
    t("identical-sig groups") {
      val g = sigs.groupBy("simhash").agg(count(lit(1)).alias("n"))
      g.select(count(lit(1)).alias("distinctSigs"), max("n").alias("maxGroup"),
        sum(col("n") * (col("n") - 1) / 2).alias("h0pairs")).show(false)
    }
    if (args.contains("occOnly")) { spark.stop(); return }
    val cand = t("candJoin(count pre-hamming)") {
      graft.ops.Dedup.simhashPairs(docs, maxHamming = 64,
        bucketed = true, chunkBits = 8).count()
    }
    println(s"[prof] candidates=$cand")
    val ham = t("candJoin(count hamming<=7)") {
      graft.ops.Dedup.simhashPairs(docs, maxHamming = 7,
        bucketed = true, chunkBits = 8).count()
    }
    println(s"[prof] hammingPass=$ham")
    val full = t("full simhashNearDup") {
      graft.ops.Dedup.simhashNearDup(docs, maxHamming = 7,
        threshold = 0.5, chunkBits = 8).count()
    }
    println(s"[prof] verified=$full")
    spark.stop()
  }
}
