package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 + the builder prompt.
  *
  * Every entry in [[queries]] has (where SQL-expressible) a DuckDB
  * oracle in [[oracleSql]] with IDENTICAL column names and ordering;
  * floating-point outputs are rounded / rank-ified on both sides so the
  * driver's value hashes match exactly.
  */
object SparkEntry {

  // ---- shared scenario constants (mirrored in the oracle CTEs) ----
  /** Count-rolling segment size (messages). */
  val SegMaxMessages = 100
  /** Greedy size rolling thresholds (reference: egress isFull rule). */
  val SegMaxBytes = 600L
  val SegSizeMaxMessages = 64
  /** Simulated in-flight/lost segments: seg_seq % 7 == 3 are absent. */
  val DropSegMod = 7; val DropSegRem = 3
  /** Committed segments for the checkpoint scenario: seg_seq < 3. */
  val CkptSegs = 3
  /** Compaction plan parameters. */
  val CompactMinSegs = 2; val CompactMaxSegs = 5

  private def msgs(s: SparkSession, dir: String): DataFrame =
    MessageFraming.messages(Tables.events(s, dir))

  private def countSegments(s: SparkSession, dir: String): DataFrame =
    SegmentRoller.byCount(msgs(s, dir), SegMaxMessages)

  private def presentSegments(s: SparkSession, dir: String): DataFrame =
    countSegments(s, dir).filter(col("seg_seq") % DropSegMod =!= DropSegRem)

  private def checkpoints(s: SparkSession, dir: String): DataFrame =
    countSegments(s, dir)
      .filter(col("seg_seq") < CkptSegs && col("message_count") === SegMaxMessages)
      .groupBy("part_id").agg(max("end_offset").as("ckpt_offset"))

  /** Anomalous stream for the audit: drop some offsets, duplicate others. */
  private def anomalousStream(s: SparkSession, dir: String): DataFrame = {
    val m = msgs(s, dir)
    val dropped = m.filter(col("event_id") % 97 =!= 13)
    val dups = m.filter(col("event_id") % 101 === 7)
    dropped.select("part_id", "msg_offset").unionAll(dups.select("part_id", "msg_offset"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- analytics: scan + filter + multi-aggregate (TPC-H Q1 shape) ----
    "q1_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 0).cast("long").as("sum_qty"),
          round(sum("l_extendedprice"), 0).cast("long").as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 0)
            .cast("long").as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 0).cast("long").as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- analytics surface (see graft.operators.Analytics) ----
    "q3_shipping_priority" -> Analytics.shippingPriority _,
    "q5_local_supplier" -> Analytics.localSupplierVolume _,
    "q6_revenue_change" -> Analytics.revenueChange _,
    "q10_returned_items" -> Analytics.returnedItems _,
    "q_top_parts_per_brand" -> Analytics.topPartsPerBrand _,
    "q_rollup_revenue" -> Analytics.rollupRevenue _,
    "q_orders_no_lineitems" -> Analytics.ordersNoLineitems _,
    "q_customers_with_orders" -> Analytics.customersWithOrders _,
    "q_distinct_users" -> Analytics.distinctUsers _,
    "q_user_running_value" -> Analytics.userRunningValue _,

    // ---- replicator domain ----
    "r_message_framing" -> ((s, dir) =>
      msgs(s, dir)
        .select("part_id", "msg_offset", "key", "msg_value", "msg_size", "event_type")
        .orderBy("part_id", "msg_offset")),

    "r_segment_assign_count" -> ((s, dir) =>
      countSegments(s, dir)
        .select("part_id", "seg_seq", "start_offset", "end_offset",
          "message_count", "seg_bytes", "level")
        .orderBy("part_id", "seg_seq")),

    "r_segment_assign_age" -> ((s, dir) =>
      SegmentRoller.byAge(msgs(s, dir))
        .select("part_id", "seg_day", "start_offset", "end_offset",
          "message_count", "seg_bytes")
        .orderBy("part_id", "seg_day")),

    "r_segment_assign_size" -> ((s, dir) =>
      SegmentRoller.bySizeGreedy(msgs(s, dir), SegMaxBytes, SegSizeMaxMessages)
        .select("part_id", "seg_seq", "start_offset", "end_offset",
          "message_count", "seg_bytes", "level")
        .orderBy("part_id", "seg_seq")),

    "r_stream_audit" -> ((s, dir) =>
      StreamAudit.audit(anomalousStream(s, dir)).orderBy("part_id")),

    "r_checkpoint" -> ((s, dir) => checkpoints(s, dir).orderBy("part_id")),

    "r_gap_detection" -> ((s, dir) =>
      GapDetector.lostRanges(presentSegments(s, dir))
        .orderBy("part_id", "lost_start")),

    "r_ingress_replay" -> ((s, dir) =>
      Ingress.replay(msgs(s, dir), presentSegments(s, dir), checkpoints(s, dir))
        .orderBy("part_id", "msg_offset")),

    "r_compaction_plan" -> ((s, dir) =>
      Compactor.plan(countSegments(s, dir), 0, CompactMinSegs, CompactMaxSegs)
        .select("part_id", "bin", "input_segments", "start_offset", "end_offset",
          "message_count", "seg_bytes", "level")
        .orderBy("part_id", "bin")),

    "r_compacted_merge" -> ((s, dir) => {
      val plan = Compactor.plan(countSegments(s, dir), 0, CompactMinSegs, CompactMaxSegs)
      Compactor.mergedStats(msgs(s, dir), plan)
        .select("part_id", "bin", "level", "message_count",
          "merged_start", "merged_end", "merged_bytes")
        .orderBy("part_id", "bin")
    }),

    "r_partition_metrics" -> ((s, dir) =>
      ReplicationMetrics.perPartition(msgs(s, dir)).orderBy("part_id")),
  )

  // ------------------------------------------------------------------
  // DuckDB oracles. Shared CTE fragments keep the two sides in lockstep.
  // ------------------------------------------------------------------

  private val MsgCte = MessageFraming.sqlCte()

  private val SegCte =
    s"""segs AS (
       |  SELECT part_id, (msg_offset // $SegMaxMessages)::BIGINT AS seg_seq,
       |         min(msg_offset) AS start_offset, max(msg_offset) AS end_offset,
       |         count(*)::BIGINT AS message_count, sum(msg_size)::BIGINT AS seg_bytes,
       |         0::INT AS level
       |  FROM messages GROUP BY 1, 2
       |)""".stripMargin

  private val PresentSegCte =
    s"""present AS (SELECT * FROM segs WHERE seg_seq % $DropSegMod <> $DropSegRem)"""

  private val CkptCte =
    s"""ckpt AS (
       |  SELECT part_id, max(end_offset) AS ckpt_offset FROM segs
       |  WHERE seg_seq < $CkptSegs AND message_count = $SegMaxMessages
       |  GROUP BY part_id
       |)""".stripMargin

  private val PlanCte =
    s"""plan AS (
       |  SELECT part_id, bin, count(*)::BIGINT AS input_segments,
       |         min(start_offset) AS start_offset, max(end_offset) AS end_offset,
       |         sum(message_count)::BIGINT AS message_count,
       |         sum(seg_bytes)::BIGINT AS seg_bytes, 1::INT AS level
       |  FROM (
       |    SELECT *, ((row_number() OVER (PARTITION BY part_id ORDER BY start_offset) - 1)
       |               // $CompactMaxSegs)::BIGINT AS bin
       |    FROM segs WHERE level = 0
       |  ) GROUP BY 1, 2
       |  HAVING count(*) >= $CompactMinSegs
       |)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 0)::BIGINT AS sum_qty,
        |  round(sum(l_extendedprice), 0)::BIGINT AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 0)::BIGINT AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 0)::BIGINT AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*)::BIGINT AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT o_orderkey, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)) * 100, 0)::BIGINT AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)) * 100, 0)::BIGINT AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin,

    "q6_revenue_change" ->
      """SELECT round(sum(l_extendedprice * l_discount) * 100, 0)::BIGINT AS revenue_cents,
        |       count(*)::BIGINT AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_quantity < 24""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |  round(sum(l_extendedprice * (1 - l_discount)) * 100, 0)::BIGINT AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_mktsegment
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,

    "q_top_parts_per_brand" ->
      """WITH rev AS (
        |  SELECT p_brand, p_partkey,
        |    round(sum(l_extendedprice * (1 - l_discount)) * 100, 0)::BIGINT AS revenue_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey
        |), ranked AS (
        |  SELECT *, rank() OVER (PARTITION BY p_brand
        |    ORDER BY revenue_cents DESC, p_partkey) AS brand_rank
        |  FROM rev
        |)
        |SELECT p_brand, brand_rank::INT AS brand_rank, p_partkey, revenue_cents
        |FROM ranked WHERE brand_rank <= 3
        |ORDER BY p_brand, brand_rank""".stripMargin,

    "q_rollup_revenue" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       round(sum(o_totalprice) * 100, 0)::BIGINT AS total_cents,
        |       count(*)::BIGINT AS n_orders
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_orders_no_lineitems" ->
      """SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
        |       round(sum(o_totalprice) * 100, 0)::BIGINT AS total_cents
        |FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_customers_with_orders" ->
      """SELECT c_mktsegment, count(*)::BIGINT AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type, count(*)::BIGINT AS n_events,
        |       count(DISTINCT user_id)::BIGINT AS n_users,
        |       round(sum(value) * 100, 0)::BIGINT AS value_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_user_running_value" ->
      """WITH e AS (
        |  SELECT user_id, event_id, round(value * 100, 0)::BIGINT AS value_cents
        |  FROM events
        |)
        |SELECT user_id, event_id, value_cents,
        |  sum(value_cents) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS run_cents,
        |  count(*) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS run_events
        |FROM e ORDER BY user_id, event_id""".stripMargin,

    "r_message_framing" ->
      s"""WITH $MsgCte
         |SELECT part_id, msg_offset, key, msg_value, msg_size, event_type
         |FROM messages ORDER BY part_id, msg_offset""".stripMargin,

    "r_segment_assign_count" ->
      s"""WITH $MsgCte, $SegCte
         |SELECT part_id, seg_seq, start_offset, end_offset, message_count,
         |       seg_bytes, level
         |FROM segs ORDER BY part_id, seg_seq""".stripMargin,

    "r_segment_assign_age" ->
      s"""WITH $MsgCte
         |SELECT part_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS seg_day,
         |       min(msg_offset) AS start_offset, max(msg_offset) AS end_offset,
         |       count(*)::BIGINT AS message_count, sum(msg_size)::BIGINT AS seg_bytes
         |FROM messages GROUP BY 1, 2 ORDER BY part_id, seg_day""".stripMargin,

    "r_segment_assign_size" ->
      s"""WITH RECURSIVE $MsgCte,
         |m AS (SELECT part_id, msg_offset, msg_size FROM messages),
         |roll AS (
         |  SELECT part_id, msg_offset, msg_size,
         |         msg_offset AS seg_start, msg_size AS acc_bytes, 1::BIGINT AS acc_cnt,
         |         (msg_size >= $SegMaxBytes OR 1 >= $SegSizeMaxMessages) AS closed
         |  FROM m WHERE msg_offset = 0
         |  UNION ALL
         |  SELECT m.part_id, m.msg_offset, m.msg_size,
         |         CASE WHEN r.closed THEN m.msg_offset ELSE r.seg_start END,
         |         CASE WHEN r.closed THEN m.msg_size ELSE r.acc_bytes + m.msg_size END,
         |         CASE WHEN r.closed THEN 1 ELSE r.acc_cnt + 1 END,
         |         ((CASE WHEN r.closed THEN m.msg_size ELSE r.acc_bytes + m.msg_size END) >= $SegMaxBytes
         |          OR (CASE WHEN r.closed THEN 1 ELSE r.acc_cnt + 1 END) >= $SegSizeMaxMessages)
         |  FROM roll r JOIN m ON m.part_id = r.part_id AND m.msg_offset = r.msg_offset + 1
         |)
         |SELECT part_id,
         |       (row_number() OVER (PARTITION BY part_id ORDER BY seg_start) - 1)::BIGINT AS seg_seq,
         |       seg_start AS start_offset, max_off AS end_offset,
         |       message_count, seg_bytes, 0::INT AS level
         |FROM (
         |  SELECT part_id, seg_start, max(msg_offset) AS max_off,
         |         count(*)::BIGINT AS message_count, sum(msg_size)::BIGINT AS seg_bytes
         |  FROM roll GROUP BY part_id, seg_start
         |)
         |ORDER BY part_id, seg_seq""".stripMargin,

    "r_stream_audit" ->
      s"""WITH $MsgCte,
         |stream AS (
         |  SELECT part_id, msg_offset FROM messages WHERE event_id % 97 <> 13
         |  UNION ALL
         |  SELECT part_id, msg_offset FROM messages WHERE event_id % 101 = 7
         |),
         |flagged AS (
         |  SELECT part_id, msg_offset,
         |         lag(msg_offset) OVER (PARTITION BY part_id ORDER BY msg_offset) AS prev_offset
         |  FROM stream
         |)
         |SELECT part_id, count(*)::BIGINT AS n_messages,
         |       sum(CASE WHEN msg_offset = prev_offset THEN 1 ELSE 0 END)::BIGINT AS n_dups,
         |       sum(CASE WHEN prev_offset IS NOT NULL AND msg_offset > prev_offset + 1
         |                THEN 1 ELSE 0 END)::BIGINT AS n_gaps,
         |       sum(CASE WHEN prev_offset IS NOT NULL AND msg_offset > prev_offset + 1
         |                THEN msg_offset - prev_offset - 1 ELSE 0 END)::BIGINT AS n_missing
         |FROM flagged GROUP BY part_id ORDER BY part_id""".stripMargin,

    "r_checkpoint" ->
      s"""WITH $MsgCte, $SegCte, $CkptCte
         |SELECT part_id, ckpt_offset FROM ckpt ORDER BY part_id""".stripMargin,

    "r_gap_detection" ->
      s"""WITH $MsgCte, $SegCte, $PresentSegCte,
         |g AS (
         |  SELECT part_id, start_offset,
         |         lag(end_offset) OVER (PARTITION BY part_id ORDER BY start_offset) AS prev_end
         |  FROM present
         |)
         |SELECT part_id, prev_end + 1 AS lost_start, start_offset - 1 AS lost_end,
         |       start_offset - prev_end - 1 AS lost_count
         |FROM g WHERE prev_end IS NOT NULL AND start_offset > prev_end + 1
         |ORDER BY part_id, lost_start""".stripMargin,

    "r_ingress_replay" ->
      s"""WITH $MsgCte, $SegCte, $PresentSegCte, $CkptCte,
         |covered AS (
         |  SELECT DISTINCT m.part_id, m.msg_offset, m.key, m.msg_size
         |  FROM messages m JOIN present p
         |    ON m.part_id = p.part_id
         |   AND m.msg_offset BETWEEN p.start_offset AND p.end_offset
         |),
         |after_ckpt AS (
         |  SELECT c.* FROM covered c LEFT JOIN ckpt k ON c.part_id = k.part_id
         |  WHERE k.ckpt_offset IS NULL OR c.msg_offset > k.ckpt_offset
         |)
         |SELECT part_id, msg_offset,
         |       (row_number() OVER (PARTITION BY part_id ORDER BY msg_offset) - 1)::BIGINT AS replay_seq,
         |       key, msg_size
         |FROM after_ckpt ORDER BY part_id, msg_offset""".stripMargin,

    "r_compaction_plan" ->
      s"""WITH $MsgCte, $SegCte, $PlanCte
         |SELECT part_id, bin, input_segments, start_offset, end_offset,
         |       message_count, seg_bytes, level
         |FROM plan ORDER BY part_id, bin""".stripMargin,

    "r_compacted_merge" ->
      s"""WITH $MsgCte, $SegCte, $PlanCte,
         |merged AS (
         |  SELECT DISTINCT m.part_id, p.bin, p.level, m.msg_offset, m.msg_size
         |  FROM messages m JOIN plan p
         |    ON m.part_id = p.part_id
         |   AND m.msg_offset BETWEEN p.start_offset AND p.end_offset
         |)
         |SELECT part_id, bin, level, count(*)::BIGINT AS message_count,
         |       min(msg_offset) AS merged_start, max(msg_offset) AS merged_end,
         |       sum(msg_size)::BIGINT AS merged_bytes
         |FROM merged GROUP BY part_id, bin, level
         |ORDER BY part_id, bin""".stripMargin,

    "r_partition_metrics" ->
      s"""WITH $MsgCte,
         |agg AS (
         |  SELECT part_id, count(*)::BIGINT AS n_messages,
         |         sum(msg_size)::BIGINT AS total_bytes,
         |         max(msg_offset) AS high_offset,
         |         max(epoch_us(ts) // 1000000) AS part_max_epoch
         |  FROM messages GROUP BY part_id
         |)
         |SELECT part_id, n_messages, total_bytes, high_offset,
         |       (SELECT max(part_max_epoch) FROM agg) - part_max_epoch AS lag_seconds
         |FROM agg ORDER BY part_id""".stripMargin,
  )
}
