package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: persistent-RDD accounting across a merge loop — pins that
  * truncateLineage's checkpoint blocks are freed per commit. */
object ProbeLeak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.graft.merge.shufflePartitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("leak").toString
    val df = (1L to 50000L).map(i => (i, i * 1.0)).toDF("id", "v")
    val kt = graft.store.KeyedTable.create(spark, t, df.schema,
      keys = Seq("id"), numBuckets = 8)
    kt.upsert(df, uniqueKeys = true)
    (1 to 10).foreach { i =>
      kt.upsert(df.where(col("id") % 97 === i).withColumn("v", col("v") + i),
        uniqueKeys = true)
      val rdds = spark.sparkContext.getPersistentRDDs
      val bm = org.apache.spark.SparkEnv.get.blockManager.master
      val st = bm.getStorageStatus.map(s => s.memUsed).sum
      println(s"AFTER $i: persistentRDDs=${rdds.size} storageMemUsed=${st}")
    }
    spark.stop()
  }
}
