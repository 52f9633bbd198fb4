package graft

import org.apache.spark.sql.functions._

import graft.core.SegmentMeta
import graft.operators.{MessageFraming, SegmentRoller}
import graft.sources.{FsSegmentStore, Tables}

class FsSegmentStoreSpec extends SparkSuite {

  private def writeRolled(store: FsSegmentStore, maxMessages: Int): Int = {
    val messages = MessageFraming.messages(Tables.events(spark, sf))
      .filter(col("part_id") === 0)
    val segs = SegmentRoller.byCount(messages, maxMessages).collect()
    segs.foreach { r =>
      val meta = SegmentMeta("src", "events", 0, 0,
        r.getAs[Long]("start_offset"), r.getAs[Long]("end_offset"),
        r.getAs[Long]("message_count"), r.getAs[Long]("seg_bytes"))
      store.write(
        messages.filter(col("msg_offset")
          .between(meta.startOffset, meta.endOffset)), meta)
    }
    segs.length
  }

  test("write → list round-trips segment identity") {
    val store = FsSegmentStore(spark, tmpDir("store"))
    val n = writeRolled(store, 25)
    val listed = store.list("src", "events")
    assert(listed.size === n)
    assert(listed.forall(_.level === 0))
    assert(listed.map(_.startOffset).sorted.head === 0L)
  }

  test("open returns all rows across segments") {
    val store = FsSegmentStore(spark, tmpDir("store"))
    writeRolled(store, 25)
    val listed = store.list("src", "events")
    val total = store.open("src", "events", listed).count()
    val expect = MessageFraming.messages(Tables.events(spark, sf))
      .filter(col("part_id") === 0).count()
    assert(total === expect)
  }

  test("compact endOffset covers overlapping inputs (rewind redelivery)") {
    import spark.implicits._
    val store = FsSegmentStore(spark, tmpDir("store"))
    val mk = (s0: Long, e0: Long) => {
      val rows = (s0 to e0).map(i => (0, i, s"k$i", 2L))
        .toDF("part_id", "msg_offset", "key", "msg_size")
      store.write(rows, graft.core.SegmentMeta("src", "t", 0, 0, s0, e0,
        e0 - s0 + 1, -1L))
    }
    // overlapping segments from an at-least-once rewind: the LAST one
    // by start offset ends EARLIER than its predecessor
    mk(0L, 9L); mk(5L, 20L); mk(10L, 15L)
    val out = store.compact("src", "t", 0, minSegments = 2, maxSegments = 5)
    assert(out.size === 1)
    assert(out.head.endOffset === 20L) // not 15 (bin.last's end)
    assert(out.head.messageCount === 21L) // offsets 0..20 deduped
  }

  test("open plans exactly ONE parquet scan regardless of segment count") {
    val store = FsSegmentStore(spark, tmpDir("store"))
    writeRolled(store, 10)
    val listed = store.list("src", "events")
    assert(listed.size > 5)
    val plan = store.open("src", "events", listed)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"$scans scan nodes:\n${plan.take(1500)}")
  }

  test("open identity columns match the listed metadata") {
    val store = FsSegmentStore(spark, tmpDir("store"))
    writeRolled(store, 25)
    val listed = store.list("src", "events")
    val opened = store.open("src", "events", listed)
      .select("seg_part", "seg_level", "start_offset", "end_offset")
      .distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val expect = listed.map(m => (m.partId, m.level, m.startOffset, m.endOffset)).toSet
    assert(opened === expect)
  }

  test("compact refuses to merge across a gap; the gap stays observable") {
    import spark.implicits._
    val store = FsSegmentStore(spark, tmpDir("store"))
    val mk = (s0: Long, e0: Long) => {
      val rows = (s0 to e0).map(i => (0, i, s"k$i", 2L))
        .toDF("part_id", "msg_offset", "key", "msg_size")
      store.write(rows, graft.core.SegmentMeta("src", "t", 0, 0, s0, e0,
        e0 - s0 + 1, -1L))
    }
    // [0,9],[10,19], GAP 20-29, [30,39],[40,49]
    mk(0L, 9L); mk(10L, 19L); mk(30L, 39L); mk(40L, 49L)
    val out = store.compact("src", "t", 0, minSegments = 2, maxSegments = 10)
    // only the contiguous prefix merged; post-gap segments left in place
    assert(out.size === 1)
    assert(out.head.endOffset === 19L)
    val after = store.list("src", "t")
    assert(after.count(_.level === 0) === 2)
    // the gap is still visible to the detector over the new inventory
    val inv = after.map(m => (m.partId, m.startOffset, m.endOffset))
      .toDF("part_id", "start_offset", "end_offset")
    val lost = graft.operators.GapDetector.lostRanges(inv).collect()
    assert(lost.length === 1)
    assert((lost.head.getAs[Long]("lost_start"), lost.head.getAs[Long]("lost_end")) === (20L, 29L))
  }

  private def mkLeveled(store: FsSegmentStore)(level: Int, s0: Long, e0: Long): Unit = {
    import spark.implicits._
    val rows = (s0 to e0).map(i => (0, i, s"k$i", 2L))
      .toDF("part_id", "msg_offset", "key", "msg_size")
    store.write(rows, SegmentMeta("src", "t", 0, level, s0, e0, e0 - s0 + 1, -1L))
  }

  test("compactLeveled: level range + resume past higher-level coverage") {
    val store = FsSegmentStore(spark, tmpDir("store"))
    val mk = mkLeveled(store) _
    mk(5, 0L, 19L)  // above maxLevel: not merged, sets the resume point
    mk(1, 10L, 29L) // overlaps the compacted range: replay only 20..29
    mk(2, 30L, 49L)
    mk(1, 50L, 59L)
    mk(0, 60L, 69L) // below minLevel: invisible to this run
    val now = System.currentTimeMillis() / 1000L + 3600L
    val out = store.compactLeveled("src", "t", minLevel = 1, maxLevel = 2,
      minAgeSec = 0L, nowEpoch = now, minSegments = 2, maxSegments = 10,
      minBytes = 0L, maxBytes = Long.MaxValue / 4)
    assert(out.size === 1)
    val seg = out.head
    assert(seg.startOffset === 20L) // resume_end(19) + 1
    assert(seg.endOffset === 59L)
    assert(seg.level === 3) // max consumed input level (2) + 1
    assert(seg.messageCount === 40L) // 20..59, compacted offsets skipped
    val after = store.list("src", "t")
    assert(after.map(_.level).sorted === Seq(0, 3, 5)) // inputs deleted
    // the merged data is exactly offsets 20..59, once each
    val rows = store.open("src", "t", after.filter(_.level == 3))
    assert(rows.count() === 40L)
    assert(rows.agg(min("msg_offset"), max("msg_offset")).head ===
      org.apache.spark.sql.Row(20L, 59L))
  }

  test("compactLeveled: byte cap stops the run, leftover segments stay") {
    val store = FsSegmentStore(spark, tmpDir("store"))
    val mk = mkLeveled(store) _
    mk(1, 0L, 9L); mk(1, 10L, 19L); mk(1, 20L, 29L); mk(1, 30L, 39L)
    val sizes = store.listInfo("src", "t")
      .map(i => i.meta.startOffset -> i.meta.sizeBytes).toMap
    val now = System.currentTimeMillis() / 1000L + 3600L
    // cap = size of the first two segments: the third crosses the cap
    // (bytes_before = cap, not < cap) and stays, as does the fourth
    val out = store.compactLeveled("src", "t", minLevel = 1, maxLevel = 1,
      minAgeSec = 0L, nowEpoch = now, minSegments = 2, maxSegments = 10,
      minBytes = 0L, maxBytes = sizes(0L) + sizes(10L))
    assert(out.size === 1)
    assert((out.head.startOffset, out.head.endOffset) === (0L, 19L))
    assert(out.head.level === 2)
    val after = store.list("src", "t")
    assert(after.filter(_.level == 1).map(_.startOffset).sorted === Seq(20L, 30L))
  }

  test("compactLeveled: repeated runs climb levels like the reference's cron") {
    val store = FsSegmentStore(spark, tmpDir("store"))
    val mk = mkLeveled(store) _
    mk(0, 0L, 9L); mk(0, 10L, 19L); mk(0, 20L, 29L); mk(0, 30L, 39L)
    val now = System.currentTimeMillis() / 1000L + 3600L
    def run() = store.compactLeveled("src", "t", minLevel = 0, maxLevel = 9,
      minAgeSec = 0L, nowEpoch = now, minSegments = 2, maxSegments = 2,
      minBytes = 0L, maxBytes = Long.MaxValue / 4)
    // run 1: merges the first TWO level-0 segments (count cap) -> level 1
    val r1 = run()
    assert(r1.size === 1 && r1.head.level === 1)
    assert((r1.head.startOffset, r1.head.endOffset) === (0L, 19L))
    // run 2: the level-1 output + next level-0 segment merge -> level 2
    val r2 = run()
    assert(r2.size === 1 && r2.head.level === 2)
    assert((r2.head.startOffset, r2.head.endOffset) === (0L, 29L))
    // run 3: level-2 + last level-0 -> level 3, everything in one segment
    val r3 = run()
    assert(r3.size === 1 && r3.head.level === 3)
    assert((r3.head.startOffset, r3.head.endOffset) === (0L, 39L))
    val finalInv = store.list("src", "t")
    assert(finalInv.size === 1)
    assert(store.open("src", "t", finalInv).count() === 40L)
  }

  test("compactLeveled: deleteInputs=false keeps the inputs") {
    val store = FsSegmentStore(spark, tmpDir("store"))
    val mk = mkLeveled(store) _
    mk(1, 0L, 9L); mk(1, 10L, 19L)
    val now = System.currentTimeMillis() / 1000L + 3600L
    val out = store.compactLeveled("src", "t", minLevel = 1, maxLevel = 1,
      minAgeSec = 0L, nowEpoch = now, minSegments = 2, maxSegments = 10,
      minBytes = 0L, maxBytes = Long.MaxValue / 4, deleteInputs = false)
    assert(out.size === 1 && out.head.level === 2)
    val after = store.list("src", "t")
    assert(after.count(_.level == 1) === 2) // inputs retained
    assert(after.count(_.level == 2) === 1)
  }

  test("compactLeveled: MinSegmentAge gate skips young segments") {
    val store = FsSegmentStore(spark, tmpDir("store"))
    val mk = mkLeveled(store) _
    mk(1, 0L, 9L); mk(1, 10L, 19L)
    val before = store.list("src", "t")
    val out = store.compactLeveled("src", "t", minLevel = 1, maxLevel = 1,
      minAgeSec = 86400L, nowEpoch = System.currentTimeMillis() / 1000L,
      minSegments = 2, maxSegments = 10, minBytes = 0L,
      maxBytes = Long.MaxValue / 4)
    assert(out.isEmpty)
    assert(store.list("src", "t").toSet === before.toSet) // untouched
  }

  test("compact merges contiguous runs, bumps level, deletes inputs") {
    val store = FsSegmentStore(spark, tmpDir("store"))
    writeRolled(store, 10)
    val before = store.list("src", "events")
    val out = store.compact("src", "events", level = 0,
      minSegments = 2, maxSegments = 5)
    assert(out.nonEmpty)
    assert(out.forall(_.level === 1))
    val after = store.list("src", "events")
    // every level-0 input that joined a full bin is gone
    assert(after.count(_.level === 1) === out.size)
    assert(after.count(_.level === 0) < before.size)
    // no message lost: level-1 counts sum to what the bins covered
    val mergedRows = store.open("src", "events", out.toSeq).count()
    assert(mergedRows === out.map(_.messageCount).sum)
  }
}
