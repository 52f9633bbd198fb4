package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries
import graft.sources.Tables

class TimeSeriesSpec extends SparkSuite {

  test("asOfJoin: inclusive match, latest prior row wins, null before first") {
    import spark.implicits._
    val left = Seq((1, 10L, "e1"), (1, 20L, "e2"), (1, 30L, "e3"), (2, 5L, "e4"))
      .toDF("k", "t", "name")
    val right = Seq((1, 10L, "r10"), (1, 25L, "r25"))
      .toDF("k", "t", "rv")
    val out = TimeSeries.asOfJoin(left, right, Seq("k"), "t", Seq("rv"))
      .orderBy("k", "t").collect()
    assert(out.map(_.getAs[String]("asof_rv")).toSeq ===
      Seq("r10", "r10", "r25", null)) // t=10 inclusive; t=30 → r25; k=2 none
  }

  test("sessionization: gap splits sessions, totals preserved") {
    val events = Tables.events(spark, sf)
    val sessions = TimeSeries.sessionize(events)
    assert(sessions.agg(sum("n_events")).head.getLong(0) === events.count())
    // session time ranges never overlap per user
    val bad = sessions
      .withColumn("prev_end", lag("end_epoch", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("session_seq")))
      .filter(col("prev_end").isNotNull && col("start_epoch") <= col("prev_end"))
      .count()
    assert(bad === 0)
  }

  test("bucketized range join equals the naive theta join") {
    import spark.implicits._
    val l = Seq((1L, 100L), (2L, 250L), (3L, 1000L)).toDF("lid", "lt")
    val r = Seq((10L, 120L), (11L, 390L), (12L, 2000L)).toDF("rid", "rt")
    val got = graft.operators.TimeSeries
      .rangeJoinBucketed(l, "lt", r, "rt", 150L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.crossJoin(r)
      .filter(abs(col("lt") - col("rt")) <= 150L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === naive)
    assert(got === Set((1L, 10L), (2L, 10L), (2L, 11L)))
  }

  test("salted join returns exactly the plain join result") {
    val events = Tables.events(spark, sf)
    val dim = events.groupBy("user_id")
      .agg(count(lit(1)).as("user_events"))
    val plain = events.join(dim, Seq("user_id"))
      .agg(sum("user_events"), count(lit(1))).head
    val salted = graft.operators.Skew.saltedJoin(events, dim, "user_id", 8)
      .agg(sum("user_events"), count(lit(1))).head
    assert(salted === plain)
  }

  test("activity pivot partitions cover all events") {
    val events = Tables.events(spark, sf)
    val p = TimeSeries.activityPivot(events)
    val total = p.select((Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view")
      .map(col).reduce(_ + _)).as("n")).agg(sum("n")).head.getLong(0)
    assert(total === events.count())
  }
}
