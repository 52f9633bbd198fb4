package graft

import org.apache.spark.sql.functions._

import graft.functions.HexHash60
import graft.sources.Tables

class HexHash60Spec extends SparkSuite {

  test("native expression equals the conv(substr(md5)) chain on real text") {
    val docs = Tables.documents(spark, sf)
    val mismatch = docs.select(
        HexHash60.hash60(col("text")).as("fast"),
        conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatch === 0)
  }

  test("known value matches the jvm helper and hex parse") {
    import spark.implicits._
    val v = Seq("abc").toDF("s")
      .select(HexHash60.hash60(col("s"))).head.getLong(0)
    val expected = java.lang.Long.parseLong(
      // md5("abc") = 900150983cd24fb0d6963f7d28e17f72
      "900150983cd24fb".substring(0, 15), 16)
    assert(v === expected)
    assert(graft.functions.Portable.jvmHexHash60("abc".getBytes("UTF-8")) === expected)
  }

  test("hex_hash60 is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    Tables.documents(spark, sf).limit(5).createOrReplaceTempView("docs_v")
    val rows = spark.sql(
      "SELECT doc_id, hex_hash60(cast(text AS binary)) AS h FROM docs_v").collect()
    assert(rows.length === 5)
    val viaDsl = Tables.documents(spark, sf).limit(5)
      .select(graft.functions.HexHash60.hash60(col("text"))).collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("h")).toSet === viaDsl)
  }

  test("expression participates in whole-stage codegen") {
    val df = Tables.documents(spark, sf).select(HexHash60.hash60(col("text")))
    val code = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(code.contains("WholeStageCodegen"), code.take(800))
    assert(code.contains("graft.functions.HexHash60.hash"), "static call not inlined")
  }

  test("int_dot / hyperplane_bucket are callable from SQL and codegen'd") {
    GraftExtensions.register(spark)
    graft.sources.Tables.embeddings(spark, sf).limit(5)
      .createOrReplaceTempView("emb_v")
    val rows = spark.sql(
      """SELECT vec_id,
        |  int_dot(transform(embedding, x -> cast(round(x*1000, 0) AS long)),
        |          transform(embedding, x -> cast(round(x*1000, 0) AS long))) AS n2,
        |  hyperplane_bucket(
        |    transform(embedding, x -> cast(round(x*1000, 0) AS long)), 8) AS b
        |FROM emb_v""".stripMargin).collect()
    assert(rows.length === 5)
    val viaDsl = graft.operators.Ann.bucketed(
        graft.sources.Tables.embeddings(spark, sf).limit(5))
      .select("vec_id", "norm2", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === viaDsl)
    val code = graft.operators.Ann.bucketed(
        graft.sources.Tables.embeddings(spark, sf))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(code.contains("graft.functions.VecOps"), "static call not inlined")
  }
}
