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

  test("columnProfile: two parallel hash-agg passes, no sort-agg funnel") {
    val df = graft.sources.Tables.lineitem(spark, sf)
    val p = Analytics.columnProfile(df)
      .queryExecution.executedPlan.toString
    // two scans (basic + distinct pass) — never a scan per column
    assert(p.split("FileScan").length - 1 === 2, p.take(2500))
    // the multi-distinct rewrite would Expand the scan #cols× and
    // funnel the distinct aggregation through one wide sort aggregate
    // (measured 10× slower); the two-pass form has NO Expand and its
    // distinct pass stays in hash aggregation. (The basic pass's
    // KEYLESS SortAggregate is fine — min(string) has no mutable hash
    // buffer, and with no grouping key it is a streaming per-partition
    // fold, not a sort.)
    assert(!p.contains("Expand"), p.take(2500))
    assert(p.contains("HashAggregate"), p.take(2500))
  }
}
