package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Multimodal column plumbing: media payloads ride through the engine
  * as opaque `binary` columns with typed metadata; decode/feature
  * extraction runs batched per partition so codec/library init
  * amortizes per task, not per row.
  *
  * The IMAGE path is a real codec: payloads are actual PNG files
  * (synthesized deterministically per document — the "object store"
  * landing step) and features come from genuinely decoding those bytes
  * with `javax.imageio` (pure-JDK, headless). Audio/video have no JDK
  * codec, so those payloads keep the honestly-declared md5 STUB
  * ([[StubCodec]]) — the schema, Dataset encoding, two-stage
  * mapPartitions batching (synthesize → decode), and metadata
  * projection are the same plumbing a production decoder drops into.
  */
object Multimodal {

  /** A media record as it would land from an object store. */
  case class MediaFile(doc_id: Long, media_type: String, payload: Array[Byte],
      n_chars: Long)

  /** Extracted features. `pixel_rgb` is the decoded top-left pixel for
    * images (proof the bytes were really parsed), -1 otherwise.
    */
  case class MediaMeta(doc_id: Long, media_type: String, width: Long,
      height: Long, pixel_rgb: Long, frames: Long)

  /** Real PNG codec over `javax.imageio`. Encoding is the test-corpus
    * synthesis step; decoding is the production-shaped path: parse the
    * binary payload, read dimensions and pixels from the decoded
    * raster.
    */
  object PngCodec {
    def encode(width: Int, height: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** (width, height, top-left RGB) read from the decoded image. */
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      (img.getWidth, img.getHeight, img.getRGB(0, 0) & 0xffffff)
    }
  }

  /** Deterministic image parameters per document — the synthesis rule
    * the DuckDB oracle reproduces arithmetically (the decoded values
    * must round-trip to exactly these).
    */
  def imageParams(docId: Long): (Int, Int, Int) = (
    (docId % 64 + 1).toInt,
    (docId % 48 + 1).toInt,
    ((docId * 2654435761L) % 16777216L).toInt)

  /** STUB codec for the modalities with no JDK decoder (audio/video):
    * deterministic dimensions from the payload's md5 so the oracle can
    * reproduce them arithmetically.
    */
  object StubCodec {
    def decode(f: MediaFile): MediaMeta = {
      val h = Portable.jvmHexHash60(f.payload)
      MediaMeta(
        doc_id = f.doc_id,
        media_type = f.media_type,
        width = h % 640 + 1,
        height = (h / 640) % 480 + 1,
        pixel_rgb = -1L,
        frames = f.n_chars / 64 + 1)
    }
  }

  /** documents → binary media table (real PNG payloads for image
    * rows) → batched decode → features. media_type cycles by source id
    * (image/audio/video) — the documents table stands in for a
    * mixed-modality corpus.
    */
  def features(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    val media = landed(spark, docs)
    // Batched decode: one codec "session" per partition (a real
    // decoder inits its native library once per task, not per row).
    media.mapPartitions { batch =>
      batch.map { f =>
        if (f.media_type == "image") {
          val (w, h, rgb) = PngCodec.decode(f.payload)
          MediaMeta(f.doc_id, f.media_type, w, h, rgb, frames = 1L)
        } else StubCodec.decode(f)
      }
    }
  }

  /** The media table as it lands: image payloads are REAL PNG bytes
    * (synthesized per doc in a batched pass), audio/video carry the
    * raw text bytes the stub hashes.
    */
  def landed(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(
        col("doc_id"),
        element_at(split(col("source"), "src"), 2).cast("int").as("src_num"),
        col("text").cast("binary").as("payload"),
        col("n_chars"))
      .withColumn("media_type",
        element_at(lit(Array("image", "audio", "video")), col("src_num") % 3 + 1))
      .select(col("doc_id"), col("media_type"), col("payload"), col("n_chars"))
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { batch =>
        batch.map { case (id, mt, payload, nChars) =>
          if (mt == "image") {
            val (w, h, rgb) = imageParams(id)
            MediaFile(id, mt, PngCodec.encode(w, h, rgb), nChars)
          } else MediaFile(id, mt, payload, nChars)
        }
      }
  }
}
