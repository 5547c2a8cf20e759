package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a larger scale factor from an existing testdata dir by
  * deterministic k-fold replication with key offsets, so scale curves
  * can be measured above the driver-provided sf0.1 without touching
  * the read-only testdata. FK relations survive (orders→customer,
  * lineitem→orders/part/supplier; offsets are per-table max+1),
  * dimension tables (region, nation) copy through unchanged — exactly
  * how TPC-H itself scales — and text/embeddings perturb per replica
  * so dedup/ANN ops don't collapse the copies into one cluster.
  *
  * BENCH-ONLY input: correctness gates always run on the
  * driver-generated dirs; this exists for the sf1.0 scale point
  * (SURVEY §6r). Usage: `ScaleData <srcDir> <dstDir> [factor=10]`.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleData <srcDir> <dstDir> [factor]")
    val (src, dst) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .appName("graft-scaledata")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try scale(spark, src, dst, factor) finally spark.stop()
  }

  def scale(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def read(n: String): DataFrame = Tables(spark, src, n)
    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).collect().head.getLong(0) + 1L

    val (cust, supp, part, ords, line, evts, docs, embs) =
      (read("customer"), read("supplier"), read("part"), read("orders"),
        read("lineitem"), read("events"), read("documents"), read("embeddings"))
    val (offC, offS, offP, offO) =
      (off(cust, "c_custkey"), off(supp, "s_suppkey"),
        off(part, "p_partkey"), off(ords, "o_orderkey"))
    val (offE, offU) = (off(evts, "event_id"), off(evts, "user_id"))
    val (offD, offV) = (off(docs, "doc_id"), off(embs, "vec_id"))

    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => shift(df, i)).reduce(_ unionByName _)

    def bump(c: String, o: Long, i: Int): Column = col(c) + lit(o * i)

    def write(df: DataFrame, n: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$n.parquet")

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(cust)((d, i) =>
      d.withColumn("c_custkey", bump("c_custkey", offC, i))), "customer")
    write(replicate(supp)((d, i) =>
      d.withColumn("s_suppkey", bump("s_suppkey", offS, i))), "supplier")
    write(replicate(part)((d, i) =>
      d.withColumn("p_partkey", bump("p_partkey", offP, i))), "part")
    write(replicate(ords)((d, i) =>
      d.withColumn("o_orderkey", bump("o_orderkey", offO, i))
        .withColumn("o_custkey", bump("o_custkey", offC, i))), "orders")
    write(replicate(line)((d, i) =>
      d.withColumn("l_orderkey", bump("l_orderkey", offO, i))
        .withColumn("l_partkey", bump("l_partkey", offP, i))
        .withColumn("l_suppkey", bump("l_suppkey", offS, i))), "lineitem")
    // same timestamps, k× distinct users: window/session densities scale
    // with data volume, the behavior a bigger corpus would actually show
    write(replicate(evts)((d, i) =>
      d.withColumn("event_id", bump("event_id", offE, i))
        .withColumn("user_id", bump("user_id", offU, i))), "events")
    write(replicate(docs)((d, i) =>
      if (i == 0) d
      else d.withColumn("doc_id", bump("doc_id", offD, i))
        // replicas are NEAR-dups of the originals, not exact dups —
        // minhash/simhash still bucket them while exact dedup keeps them
        .withColumn("text", concat(col("text"), lit(s" r$i")))
        .withColumn("n_chars", col("n_chars") + lit(s" r$i".length.toLong))),
      "documents")
    write(replicate(embs)((d, i) =>
      if (i == 0) d
      else d.withColumn("vec_id", bump("vec_id", offV, i))
        // ROTATE dimensions by the replica index: rotations of a random
        // vector are mutually near-orthogonal, so replicas stay
        // in-distribution WITHOUT being near-dups of their source — a
        // small additive drift left them at cosine ~0.9999 and the
        // near-dup detector (correctly) flagged every replica pair,
        // which a fixed-construction oracle can't enumerate
        .withColumn("embedding", expr(
          s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), " +
            s"slice(embedding, 1, $i))"))), "embeddings")
    println(s"""{"scaled":"$dst","factor":$factor}""")
  }
}
