package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 B12): media as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches via `mapPartitions` (the Scala analog of `mapInPandas` —
  * the decode loop sees an iterator of rows per partition, amortizing
  * any per-batch codec init exactly like a pandas batch would).
  *
  * The actual byte decoders are STUBBED deterministically — no
  * image/audio codecs exist in this container — but everything
  * Spark-level is real: the binary column, the typed output schema,
  * the partition-batch iteration, and the metadata projections.
  */
object Multimodal {

  /** Typed metadata a media decoder would produce. */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Int,
      media_type: String,
      width: Int,
      height: Int,
      frames: Int)

  /** STUB decoder: derives deterministic pseudo-metadata from the raw
    * bytes. A real deployment swaps `decodeOne` for a codec call; the
    * partition-batch shape, schema, and plumbing stay identical. */
  private def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    MediaMeta(
      doc_id = id,
      byte_len = n,
      media_type = if (n % 3 == 0) "image" else if (n % 3 == 1) "audio" else "video",
      width = n % 640,
      height = n % 480,
      frames = n / 1000 + 1)
  }

  /** Attaches a binary media column (here: utf-8 of `text`, standing in
    * for real media bytes) — the ingest shape of a multimodal corpus. */
  def withBinaryColumn(df: DataFrame, text: String = "text"): DataFrame =
    df.withColumn("media", col(text).cast("binary"))

  /** Runs the (stub) decoder over partition-sized batches of binary
    * payloads. Distributed map-only stage: no shuffle, no collect. */
  def decodeMeta(df: DataFrame, id: String = "doc_id", media: String = "media")
      : Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    df.select(col(id).cast("long"), col(media))
      .mapPartitions { rows =>
        // per-partition init would go here (codec contexts, buffers)
        rows.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
  }

  /** Frame-sampling schedule for video payloads: every `stride`-th
    * frame index of each document's decoded frame count — the
    * (doc, frame) work list a downstream frame decoder fans out over.
    * Pure projection + generator, no shuffle. */
  def frameSample(meta: DataFrame, stride: Int = 2): DataFrame =
    meta.select(col("doc_id"),
      explode(sequence(lit(0), col("frames") - 1, lit(stride))).alias("frame_idx"))

  final case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** Feature extraction over EXPLICIT fixed-size batches inside each
    * partition (`iterator.grouped`) — the exact execution shape of an
    * Arrow-batched `mapInPandas` extractor: per-batch model invocation,
    * per-partition model init, bounded batch memory. The embedding
    * itself is a deterministic stub (no ML runtime in this container);
    * a real deployment swaps `embedBatch`'s body for a model call. */
  def extractFeatures(df: DataFrame, batchSize: Int = 64, dim: Int = 8,
      id: String = "doc_id", media: String = "media"): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    def embedBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
      // real impl: one model forward pass over the whole batch
      batch.map { case (docId, bytes) =>
        val fs = Array.tabulate(dim) { i =>
          var h = docId * 0x9E3779B97F4A7C15L + i
          var j = 0
          while (j < math.min(bytes.length, 64)) { h = h * 31 + bytes(j); j += 1 }
          ((h % 1000 + 1000) % 1000) / 1000.0f
        }
        MediaFeatures(docId, fs)
      }
    df.select(col(id).cast("long"), col(media))
      .mapPartitions { rows =>
        // per-partition init (load model weights once per executor task)
        rows.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
          .grouped(batchSize)
          .flatMap(b => embedBatch(b.toSeq))
      }
  }
}
