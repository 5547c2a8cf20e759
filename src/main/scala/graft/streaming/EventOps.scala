package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming analytics over the events stream (SURVEY.md §2
  * C1-C3). Each op has a genuine streaming form; the batch fixpoint of
  * the same computation backs the DuckDB oracle.
  */
object EventOps {

  /** Streams a parquet events source through the given transform into
    * an in-memory sink and returns the drained result — the local test
    * harness for streaming ops (availableNow semantics). */
  def runToMemory(spark: SparkSession, sourcePath: String, name: String,
      outputMode: OutputMode = OutputMode.Complete())(
      f: DataFrame => DataFrame): DataFrame = {
    val q = f(eventStream(spark, sourcePath)).writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Streaming read of an events parquet source, converting the INT64
    * nano timestamps Spark can't read natively (see Tables.eventsDf). */
  def eventStream(spark: SparkSession, sourcePath: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(sourcePath).schema
    // the file stream source needs a directory; single-file sources get
    // linked into a temp dir (cluster deployments stream real dirs)
    val dirPath = {
      val conf = spark.sessionState.newHadoopConf()
      val src = new org.apache.hadoop.fs.Path(sourcePath)
      val fs = src.getFileSystem(conf)
      if (fs.getFileStatus(src).isDirectory) sourcePath
      else {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream")
        val dst = new org.apache.hadoop.fs.Path(tmp.toString, src.getName)
        org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
        tmp.toString
      }
    }
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 8).parquet(dirPath)
    // watermarks require TIMESTAMP (LTZ); session tz is UTC so values
    // align with the NTZ batch reads — outputs cast back to NTZ
    import org.apache.spark.sql.types._
    schema("ts").dataType match {
      case LongType =>
        // integer `div`, NOT `/`: ns epoch values exceed double's 53-bit
        // mantissa (same fix as Tables.eventsDf)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** C1: tumbling-window aggregation with a watermark. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").alias("w"), col("event_type"))
      .agg(count(lit(1)).alias("cnt"), round(sum("value"), 2).alias("total"))
      .select(col("w.start").cast(org.apache.spark.sql.types.TimestampNTZType)
          .alias("window_start"),
        col("event_type"), col("cnt"), col("total"))

  /** C10: stream-stream INTERVAL join — each click attributed to the
    * purchases the same user makes within the following hour. Both
    * sides carry watermarks and the join condition bounds the time
    * range, so Spark can evict state as the watermark advances —
    * unbounded-stream-safe, unlike an unconstrained stream-stream
    * join. */
  def intervalJoin(clicks0: DataFrame, purchases0: DataFrame): DataFrame = {
    val ntz = org.apache.spark.sql.types.TimestampNTZType
    val clicks = clicks0.where(col("event_type") === "click")
      .select(col("event_id").alias("click_id"), col("user_id"),
        col("ts").alias("click_ts"), col("value").alias("click_value"))
      .withWatermark("click_ts", "1 hour")
    val purchases = purchases0.where(col("event_type") === "purchase")
      .select(col("event_id").alias("purchase_id"),
        col("user_id").alias("p_user_id"), col("ts").alias("purchase_ts"),
        col("value").alias("purchase_value"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts").cast(ntz).alias("click_ts"),
        col("purchase_ts").cast(ntz).alias("purchase_ts"),
        col("purchase_value"))
  }

  /** C10b: LEFT OUTER stream-stream interval join — clicks WITHOUT a
    * purchase in their 1-hour window emit with null purchase columns
    * once the watermark passes the window (genuine outer-join state
    * eviction: Spark holds the unmatched click until no late purchase
    * can still match). Same state bound as [[intervalJoin]]. */
  def intervalJoinLeft(clicks0: DataFrame, purchases0: DataFrame): DataFrame = {
    val ntz = org.apache.spark.sql.types.TimestampNTZType
    val clicks = clicks0.where(col("event_type") === "click")
      .select(col("event_id").alias("click_id"), col("user_id"),
        col("ts").alias("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = purchases0.where(col("event_type") === "purchase")
      .select(col("event_id").alias("purchase_id"),
        col("user_id").alias("p_user_id"), col("ts").alias("purchase_ts"),
        col("value").alias("purchase_value"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts").cast(ntz).alias("click_ts"),
        col("purchase_ts").cast(ntz).alias("purchase_ts"),
        col("purchase_value"))
  }

  /** C2: streaming dedup by event id within the watermark. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, end: Long, n: Int)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, duration_secs: Long)

  /** C3 (streaming form): sessionization with a gap timeout via
    * flatMapGroupsWithState — sessions close when no event arrives
    * within `gapSecs` of processing progress. */
  def sessionizeStream(spark: SparkSession, events: DataFrame, gapSecs: Long = 1800)
      : DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long"), col("ts").cast("timestamp"))
      .as[SessionEvent]
    def fn(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(st) if t - st.end <= gapSecs * 1000 =>
            cur = Some(st.copy(end = t, n = st.n + 1))
          case Some(st) =>
            out ::= SessionOut(userId, new java.sql.Timestamp(st.start),
              new java.sql.Timestamp(st.end), st.n, (st.end - st.start) / 1000)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach(state.update)
      out.reverseIterator
    }
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
      .toDF()
  }

  /** Time-series similarity search (cf. "Time Series Similarity Search
    * for Streaming Data in Distributed Systems", EDBT 2019): per-user
    * hourly activity series, ranked by Pearson correlation against one
    * target user's series. The hour-bucketed join carries one row per
    * (user, overlapping hour) — never a series×series cross product —
    * and the correlation is a single codegen'd `corr` aggregate per
    * user. `minOverlap` suppresses spurious matches on tiny overlaps. */
  def seriesSimilarity(events: DataFrame, targetUser: Long, k: Int = 10,
      minOverlap: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events.groupBy(col("user_id"),
        date_trunc("hour", col("ts")).alias("h"))
      .agg(avg("value").alias("v"))
    val target = hourly.where(col("user_id") === targetUser)
      .select(col("h"), col("v").alias("tv"))
    val scored = hourly.where(col("user_id") =!= targetUser)
      .join(broadcast(target), "h")
      .groupBy("user_id")
      .agg(round(corr(col("v"), col("tv")), 4).alias("similarity"),
        count(lit(1)).alias("overlap_hours"))
      .where(col("overlap_hours") >= minOverlap && col("similarity").isNotNull)
    val w = Window.orderBy(col("similarity").desc, col("user_id").asc)
    scored.orderBy(col("similarity").desc, col("user_id").asc).limit(k)
      .withColumn("rank", row_number().over(w))
  }

  /** C3 (batch fixpoint): the same sessions via gaps-and-islands window
    * SQL — this is what the DuckDB oracle mirrors. */
  def sessionizeBatch(events: DataFrame, gapSecs: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val flagged = events
      .select(col("user_id"), col("ts"))
      .withColumn("__prev", lag("ts", 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("__prev")) > gapSecs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("__new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy("user_id", "session_id")
      .agg(count(lit(1)).alias("n_events"),
        min("ts").alias("session_start"),
        max("ts").alias("session_end"))
  }
}
