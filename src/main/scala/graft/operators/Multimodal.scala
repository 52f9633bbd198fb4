package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Multimodal column plumbing: media payloads ride through the engine
  * as opaque `binary` columns with typed metadata; decode/feature
  * extraction runs batched per partition so a real codec would amortize
  * model/library init per task, not per row.
  *
  * The actual codec is STUBBED (no image/audio libs in this
  * container): [[StubCodec.decode]] derives deterministic fake
  * dimensions from an md5 of the payload. Everything around it — the
  * binary schema, the Dataset encoding, the mapPartitions batching,
  * the metadata join-back — is the real plumbing a production decode
  * path would use.
  */
object Multimodal {

  /** A media record as it would land from an object store. */
  case class MediaFile(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (deterministic stub values). */
  case class MediaMeta(doc_id: Long, media_type: String, payload_bytes: Long,
      width: Long, height: Long, frames: Long)

  /** STUB codec — stands in for an image/audio/video decoder.
    * Deterministic: dimensions derive from the payload's md5 so the
    * DuckDB oracle can reproduce them arithmetically.
    */
  object StubCodec {
    def decode(f: MediaFile, nChars: Long): MediaMeta = {
      val h = Portable.jvmHexHash60(f.payload)
      MediaMeta(
        doc_id = f.doc_id,
        media_type = f.media_type,
        payload_bytes = f.payload.length.toLong,
        width = h % 640 + 1,
        height = (h / 640) % 480 + 1,
        frames = nChars / 64 + 1)
    }
  }

  /** documents → binary media table → batched decode → features.
    * media_type cycles by source id (image/audio/video) — the
    * documents table stands in for a mixed-modality corpus.
    */
  def features(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    val media = docs.select(
        col("doc_id"),
        element_at(split(col("source"), "src"), 2).cast("int").as("src_num"),
        col("text").cast("binary").as("payload"),
        col("n_chars"))
      .withColumn("media_type",
        element_at(lit(Array("image", "audio", "video")), col("src_num") % 3 + 1))
      .select(col("doc_id"), col("media_type"), col("payload"), col("n_chars"))
      .as[(Long, String, Array[Byte], Long)]
    // Batched decode: one codec "session" per partition (where a real
    // decoder would init its native library once per task).
    media.mapPartitions { batch =>
      batch.map { case (id, mt, payload, nChars) =>
        StubCodec.decode(MediaFile(id, mt, payload), nChars)
      }
    }
  }
}
