package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSuite {

  private lazy val feats =
    Multimodal.features(spark, Tables.documents(spark, sf)).cache()

  test("decode is deterministic and covers every document") {
    val docs = Tables.documents(spark, sf)
    assert(feats.count() === docs.count())
    val again = Multimodal.features(spark, docs).collect().toSet
    assert(feats.collect().toSet === again)
  }

  test("PNG payloads are real images and decode round-trips the synthesis params") {
    // unit: encode → decode through javax.imageio recovers the params
    val bytes = Multimodal.PngCodec.encode(17, 9, 0xa1b2c3)
    assert(bytes.take(4).toSeq === Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    assert(Multimodal.PngCodec.decode(bytes) === ((17, 9, 0xa1b2c3)))
    // corpus: every image row's DECODED dims/pixel equal the params
    val mismatch = feats.toDF().filter(col("media_type") === "image")
      .filter(
        col("width") =!= col("doc_id") % 64 + 1 ||
        col("height") =!= col("doc_id") % 48 + 1 ||
        col("pixel_rgb") =!= (col("doc_id") * 2654435761L) % 16777216L)
      .count()
    assert(mismatch === 0)
    assert(feats.toDF().filter(col("media_type") === "image").count() > 0)
  }

  test("stub dimensions stay in their declared ranges") {
    val df = feats.toDF()
    assert(df.filter(col("width") < 1 || col("width") > 640).count() === 0)
    assert(df.filter(col("height") < 1 || col("height") > 480).count() === 0)
    assert(df.filter(col("frames") < 1).count() === 0)
    assert(df.filter(!col("media_type").isin("image", "audio", "video")).count() === 0)
  }

  test("landed media table carries real binary payloads for every doc") {
    val landed = Multimodal.landed(spark, Tables.documents(spark, sf))
    val rows = landed.collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    // image payloads are PNG containers, not the source text
    val img = rows.filter(_.media_type == "image")
    assert(img.nonEmpty)
    assert(img.forall(f => f.payload.take(4).toSeq ===
      Seq[Byte](0x89.toByte, 'P', 'N', 'G')))
    assert(rows.filter(_.media_type != "image").forall(_.payload.nonEmpty))
  }
}
