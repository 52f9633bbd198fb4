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

  test("stub dimensions stay in their declared ranges") {
    val df = feats.toDF()
    assert(df.filter(col("width") < 1 || col("width") > 640).count() === 0)
    assert(df.filter(col("height") < 1 || col("height") > 480).count() === 0)
    assert(df.filter(col("frames") < 1).count() === 0)
    assert(df.filter(!col("media_type").isin("image", "audio", "video")).count() === 0)
  }

  test("payload bytes round-trip the source text length") {
    val mismatch = feats.toDF().as("f")
      .join(Tables.documents(spark, sf).as("d"), col("f.doc_id") === col("d.doc_id"))
      .filter(col("payload_bytes") =!= length(col("text")))
      .count()
    assert(mismatch === 0)
  }
}
