package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Time-series operators over the event stream: as-of join,
  * sessionization, pivoted activity — capabilities a replicated-stream
  * consumer queries constantly.
  */
object TimeSeries {

  /** As-of join: for each left row, the most recent right row (same
    * keys, right.time <= left.time, inclusive).
    *
    * Implementation is the union + forward-fill trick, NOT a range
    * join: tag both sides, union, one window sorted by (time, side)
    * per key, `last(_, ignoreNulls)` forward-fills the right payload,
    * then keep left rows. One shuffle on the join keys, linear in
    * |left|+|right| — at 100 TB a range join would explode while this
    * stays a single sort per key partition. (Right rows sort before
    * left rows at equal time, making the match inclusive.)
    *
    * `rightCols` are forward-filled into `asof_<name>` columns.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = rightCols.foldLeft(
      left.withColumn("__side", lit(1))) { (df, c) =>
      df.withColumn(s"asof_$c", lit(null).cast(right.schema(c).dataType))
    }
    val r0 = right
      .select((keys.map(col) :+ col(timeCol)) ++
        rightCols.map(c => col(c).as(s"asof_$c")): _*)
      .withColumn("__side", lit(0))
    val r = leftCols.filterNot(c => keys.contains(c) || c == timeCol)
      .foldLeft(r0) { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }
    val unioned = l.unionByName(r)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** Events with the user's most recent purchase attached (as-of). */
  def eventsWithLastPurchase(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    asOfJoin(
      events.select("user_id", "ts", "event_id"),
      purchases, Seq("user_id"), "ts", Seq("purchase_id", "purchase_ts"))
      .select(
        col("user_id"), col("event_id"),
        coalesce(col("asof_purchase_id"), lit(-1L)).as("last_purchase_id"),
        coalesce(
          expr("(unix_micros(ts) - unix_micros(asof_purchase_ts)) div 1000000"),
          lit(-1L)).as("secs_since_purchase"))
  }

  /** Bucketized range join: pairs (l, r) with |l.time - r.time| <=
    * radius, WITHOUT a nested-loop/theta join. Each left row explodes
    * to the 3 buckets (of width = radius) that could contain matches;
    * the right side maps to its own bucket; candidates come from the
    * bucket equi-join and only candidates pay the exact |diff| check.
    * At 100 TB the bucket id is the shuffle key — cost is
    * 3·|L| + |R| + |true matches|, not |L|·|R|.
    *
    * Times are exact epoch seconds (longs) on both engines.
    */
  def rangeJoinBucketed(left: DataFrame, leftEpoch: String,
      right: DataFrame, rightEpoch: String, radiusSec: Long): DataFrame = {
    val l = left
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket", expr(s"$leftEpoch div $radiusSec") + col("__off"))
      .drop("__off")
    val r = right.withColumn("__bucket", expr(s"$rightEpoch div $radiusSec"))
    l.join(r, Seq("__bucket"))
      .filter(abs(col(leftEpoch) - col(rightEpoch)) <= radiusSec)
      .drop("__bucket")
  }

  /** Gap-based sessionization: a >30-minute silence starts a new
    * session. Two windows over one shuffle on user_id.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    graft.core.Configs.Session(gapSeconds).validated
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val epoch = col("ts").cast("long")
    val flagged = events
      .withColumn("prev_epoch", lag(epoch, 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_epoch").isNull ||
          epoch - col("prev_epoch") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min(epoch).as("start_epoch"),
        max(epoch).as("end_epoch"),
        round(sum(col("value")) * 100, 0).cast("long").as("value_cents"))
  }

  /** Time-bucket resampling: per (user, hour) OHLC-style aggregates —
    * first/last value (by event order), min/max, count. First/last are
    * deterministic: `min_by/max_by(value_cents, event_id)` pick the
    * value at the group's least/greatest globally-unique event_id —
    * identical to the old two-row_number form, but in ONE
    * partial-aggregating aggregate. min_by/max_by keep every buffer
    * slot an atomic long, so the plan is a true HashAggregate with no
    * sort anywhere (the r20 `min/max(struct(...))` form computed the
    * same thing but a struct-typed buffer forces SortAggregate plus a
    * map-side Sort — the r20 after-plan showed exactly that); hot
    * (user, hour) groups still collapse map-side before the exchange
    * (guide §2.3).
    */
  def resampleHourly(events: DataFrame): DataFrame = {
    val hour = date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00")
    val cents = round(col("value") * 100, 0).cast("long")
    val base = events.select(col("user_id"), hour.as("hour"),
      col("event_id"), cents.as("value_cents"))
    base
      .groupBy("user_id", "hour")
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("value_cents"), col("event_id")).as("open_cents"),
        max_by(col("value_cents"), col("event_id")).as("close_cents"),
        min("value_cents").as("low_cents"),
        max("value_cents").as("high_cents"))
  }

  /** Per-partition activity pivoted by event type (explicit conditional
    * aggregation — stays in one codegen'd pass).
    */
  def activityPivot(events: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val aggs = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")) :+
      round(sum("value") * 100, 0).cast("long").as("value_cents")
    events
      .withColumn("part_id", (col("user_id") % MessageFraming.NumPartitions).cast("int"))
      .groupBy("part_id")
      .agg(aggs.head, aggs.tail: _*)
  }
}
