package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Value + plan specs for the one-pass column profiler (Q24). */
class AnalyticsProfileSpec extends SparkSuite {

  test("columnProfile: exact counts/nulls/distincts/min/max on a hand table") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(2.5)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(-1.0)))
      .toDF("id", "s", "v")
    val out = Analytics.columnProfile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(out("id") === ((4L, 0L, 4L, "1", "4")))
    assert(out("s") === ((4L, 1L, 2L, "a", "b")))
    assert(out("v") === ((4L, 1L, 2L, "-1.0", "2.5")))
    // explicit column subset profiles only those columns
    assert(Analytics.columnProfile(df, Seq("id")).collect().length === 1)
  }

  test("columnProfile is one pass: a single Expand, no per-column scans") {
    val df = graft.sources.Tables.lineitem(spark, sf)
    val p = Analytics.columnProfile(df)
      .queryExecution.executedPlan.toString
    // the multi-distinct rewrite: one Expand over one scan — a scan
    // per column (the naive profiler) would show up as many file scans
    assert(p.split("Expand").length - 1 === 1, p.take(2000))
    assert(p.split("FileScan").length - 1 <= 1, p.take(2000))
  }
}
