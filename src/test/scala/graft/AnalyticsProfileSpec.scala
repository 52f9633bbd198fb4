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
    // double min/max render through DECIMAL(38,6) — fixed notation on
    // every engine, where native double->string flips to scientific
    assert(out("v") === ((4L, 1L, 2L, "-1.000000", "2.500000")))
    // explicit column subset profiles only those columns
    assert(Analytics.columnProfile(df, Seq("id")).collect().length === 1)
  }

  test("columnProfile: hostile column names profile, never parse") {
    import spark.implicits._
    val df = Seq((1L, 2.0, "x"), (2L, 7.5, "y"))
      .toDF("weird col", "qu'o\"te", "back`tick.dot")
    val out = Analytics.columnProfile(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out.keySet === Set("weird col", "qu'o\"te", "back`tick.dot"))
    assert(out("weird col") === 2L) // distinct values survived intact
    // large doubles stay in fixed notation (Spark-native rendering
    // would write 1.23E8 here)
    val big = Seq((123000000.5, 1L)).toDF("v", "id")
    val bigOut = Analytics.columnProfile(big, Seq("v")).collect()(0)
    assert(bigOut.getString(4) === "123000000.500000")
  }

  test("columnProfileApprox: one scan, HLL within rsd of exact") {
    val df = graft.sources.Tables.lineitem(spark, sf)
    val approx = Analytics.columnProfileApprox(df)
    val p = approx.queryExecution.executedPlan.toString
    // the whole profile is ONE scan + one global agg: no unpivot pass,
    // no distinct shuffle, no Expand
    assert(p.split("FileScan").length - 1 === 1, p.take(2500))
    assert(!p.contains("Expand"), p.take(2500))
    val exact = Analytics.columnProfile(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    val rows = approx.collect()
    assert(rows.length === exact.size)
    rows.foreach { r =>
      val c = r.getString(0)
      val (exNull, exDist, exMin, exMax) = exact(c)
      // HLL++ at rsd=0.05; generous 4-sigma-ish envelope plus
      // small-count slack keeps this deterministic-data check tight
      // but honest
      assert(math.abs(r.getLong(3) - exDist)
          <= math.max(4L, (0.2 * exDist).toLong),
        s"col=$c approx=${r.getLong(3)} exact=$exDist")
      // everything except the distinct estimate agrees EXACTLY
      assert(r.getLong(2) === exNull, s"col=$c n_null")
      assert(r.getString(4) === exMin, s"col=$c min_s")
      assert(r.getString(5) === exMax, s"col=$c max_s")
    }
  }

  test("valueQuantilesApprox: one sketch pass, rank error within bound") {
    val approx = Analytics.valueQuantilesApprox(spark, sf)
    val p = approx.queryExecution.executedPlan.toString
    // the exact form's machinery must be absent — sketches partial-
    // aggregate map-side and the only exchanges are the one hash
    // exchange feeding the final aggregate plus the 5-row output sort
    // (no data-wide range repartition, no rank windows)
    assert(p.contains("partial_percentile_approx"), p.take(2500))
    assert(!p.contains("window") && !p.contains("row_number"), p.take(2500))
    assert("Exchange ".r.findAllIn(p).size <= 2, p.take(2500))
    // percentile_approx guarantees rank error <= n/accuracy; verify
    // each reported quantile's true rank against the sorted group
    val byType = graft.sources.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    approx.collect().foreach { r =>
      val vs = byType(r.getString(0))
      val n = vs.length
      for ((c, q) <- Seq((r.getLong(1), 0.5), (r.getLong(2), 0.9))) {
        // cents-rounded value back to the value domain (±0.005 slack)
        val rank = vs.count(_ <= c / 100.0 + 0.005)
        assert(math.abs(rank - q * n) <= n / 1000.0 + 2,
          s"${r.getString(0)} q=$q rank=$rank target=${q * n} n=$n")
      }
      // min/max are exact aggregates, identical to the exact form
      assert(r.getLong(3) <= r.getLong(1) && r.getLong(1) <= r.getLong(4))
    }
  }

  test("columnProfile: two parallel hash-agg passes, no sort-agg funnel") {
    val df = graft.sources.Tables.lineitem(spark, sf)
    // The distinct pass (r20: memoized per corpus and joined back as a
    // |cols|-row local relation — the truth-memo discipline; r21: one
    // overlapped job per column instead of the single stack-unpivot
    // job) is audited on its per-column plan: the multi-distinct
    // rewrite would Expand the scan #cols× and funnel the distinct
    // aggregation through one wide sort aggregate (measured 10×
    // slower); the per-column form has NO Expand, stays in hash
    // aggregation, and scans ONLY its own pruned column.
    val nd = Analytics.exactDistinctColumnPlan(df, "l_shipdate")
      .queryExecution.executedPlan.toString
    assert(nd.split("FileScan").length - 1 === 1, nd.take(2500))
    assert(!nd.contains("Expand"), nd.take(2500))
    assert(nd.contains("HashAggregate"), nd.take(2500))
    assert(nd.contains("ReadSchema: struct<l_shipdate"), nd.take(2500))
    // the served profile itself: ONE corpus scan (the basic pass —
    // never a scan per column), the distinct counts joined in as a
    // broadcast local relation. (The basic pass's KEYLESS
    // SortAggregate is fine — min(string) has no mutable hash buffer,
    // and with no grouping key it is a streaming per-partition fold,
    // not a sort.)
    val p = Analytics.columnProfile(df)
      .queryExecution.executedPlan.toString
    assert(p.split("FileScan").length - 1 === 1, p.take(2500))
    assert(!p.contains("Expand"), p.take(2500))
    assert(p.contains("LocalTableScan") || p.contains("BroadcastHashJoin"),
      p.take(2500))
  }

  test("audit gates: measured flags are green, and every field but the flag is exact") {
    val prof = Analytics.columnProfileAudit(
      graft.sources.Tables.lineitem(spark, sf)).collect()
    assert(prof.nonEmpty)
    prof.foreach { r =>
      assert(r.getAs[Long]("within_bound") === 1L, r.toString)
      assert(r.getAs[Long]("bound_bp") === 2000L)
    }
    val qa = Analytics.valueQuantilesAudit(spark, sf).collect()
    assert(qa.length === 10) // 5 event types x 2 quantiles
    qa.foreach { r =>
      assert(r.getAs[Long]("within_bound") === 1L, r.toString)
      // budget is derived from n alone: 2n/accuracy + 1
      assert(r.getAs[Long]("rank_budget") ===
        2 * r.getAs[Long]("n_grp") / 1000 + 1)
    }
  }
}
