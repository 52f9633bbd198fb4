package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.operators.{Analytics, MessageFraming, ReplicationMetrics, SegmentRoller, TimeSeries}
import graft.sources.Tables

/** Guard against testdata regeneration drifting the `events.ts`
  * physical encoding (it has happened twice: TIMESTAMP(NANOS) read as
  * long under `nanosAsLong`, then TIMESTAMP(MICROS, isAdjustedToUTC=0)
  * read as TIMESTAMP_NTZ). The contract under test: `Tables.events`
  * normalizes every known encoding to a plain TimestampType, so every
  * ts-touching operator resolves and produces identical results
  * regardless of how the parquet was written.
  */
class SchemaDriftSpec extends SparkSuite {

  /** Canonical events slice written under each encoding. */
  private lazy val encodedDirs: Map[String, String] = {
    val base = Tables.events(spark, sf)
      .filter(col("user_id") < 200)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(base.schema("ts").dataType == TimestampType,
      "precondition: Tables.events must already normalize the live testdata")

    def write(tag: String, df: DataFrame): (String, String) = {
      val d = tmpDir(s"drift-$tag")
      df.write.mode("overwrite").parquet(s"$d/events.parquet")
      tag -> d
    }
    Map(
      // Spark's default parquet writer: TIMESTAMP(MICROS, adjusted) -> LTZ.
      write("micros-ltz", base),
      // isAdjustedToUTC=0 -> Spark 4 reads TIMESTAMP_NTZ (the r09 break).
      write("micros-ntz", base.withColumn("ts", col("ts").cast(TimestampNTZType))),
      // TIMESTAMP(NANOS) under nanosAsLong=true surfaces as a plain long
      // nano count; a written int64 column round-trips to the same read.
      write("nanos-long", base.withColumn("ts", expr("unix_micros(ts) * 1000L"))))
  }

  test("Tables.events normalizes all three encodings to TimestampType") {
    for ((tag, dir) <- encodedDirs) {
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt == TimestampType, s"$tag read back as $dt")
    }
  }

  /** Each ts-touching operator must resolve and agree across encodings. */
  private val operators: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] = Seq(
    "asOfJoin" -> ((s, d) => TimeSeries.eventsWithLastPurchase(Tables.events(s, d))
      .orderBy("user_id", "event_id")),
    "sessionize" -> ((s, d) => TimeSeries.sessionize(Tables.events(s, d))
      .orderBy("user_id", "session_seq")),
    "resampleHourly" -> ((s, d) => TimeSeries.resampleHourly(Tables.events(s, d))
      .orderBy("user_id", "hour")),
    "perPartition" -> ((s, d) =>
      ReplicationMetrics.perPartition(MessageFraming.messages(Tables.events(s, d)))
        .orderBy("part_id")),
    "byAge" -> ((s, d) =>
      SegmentRoller.byAge(MessageFraming.messages(Tables.events(s, d)))
        .orderBy("part_id", "seg_day")),
    "valueQuantiles" -> ((s, d) => Analytics.valueQuantiles(s, d)))

  for ((name, op) <- operators) {
    test(s"$name agrees across ts encodings") {
      val reference = op(spark, encodedDirs("micros-ltz")).collect().toSeq
      assert(reference.nonEmpty, s"$name produced no rows")
      for (tag <- Seq("micros-ntz", "nanos-long")) {
        val got = op(spark, encodedDirs(tag)).collect().toSeq
        assert(got == reference, s"$name diverges under $tag encoding")
      }
    }
  }
}
