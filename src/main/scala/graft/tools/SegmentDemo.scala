package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.SegmentMeta
import graft.operators.{MessageFraming, SegmentRoller}
import graft.sources.{FsSegmentStore, Tables}

/** Runnable end-to-end demo of the replicator lifecycle on a local
  * segment store: frame → roll → write → list → compact → list.
  *
  *   java -cp <classes:spark-jars> graft.tools.SegmentDemo <sfDir> <storeDir>
  */
object SegmentDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, storeDir) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val store = FsSegmentStore(spark, storeDir)
    val messages = MessageFraming.messages(Tables.events(spark, sfDir)).cache()

    // egress: roll into count-bounded segments and persist each
    val segs = SegmentRoller.byCount(messages, 50).collect()
    segs.foreach { r =>
      val meta = SegmentMeta("src", "events", r.getAs[Int]("part_id"), 0,
        r.getAs[Long]("start_offset"), r.getAs[Long]("end_offset"),
        r.getAs[Long]("message_count"), r.getAs[Long]("seg_bytes"))
      store.write(messages.filter(col("part_id") === meta.partId &&
        col("msg_offset").between(meta.startOffset, meta.endOffset)), meta)
    }
    val level0 = store.list("src", "events")
    println(s"[demo] wrote ${level0.size} level-0 segments")

    // compaction: merge runs of up to 4 into level-1 segments
    val compacted = store.compact("src", "events", 0, 2, 4)
    val after = store.list("src", "events")
    println(s"[demo] compacted into ${compacted.size} level-1 segments; " +
      s"inventory now level0=${after.count(_.level == 0)} level1=${after.count(_.level == 1)}")

    // replay check: every framed message survives exactly once
    val total = store.open("src", "events", after).dropDuplicates("part_id", "msg_offset").count()
    println(s"[demo] distinct replayable messages = $total (source = ${messages.count()})")

    // continuous ingress: stream the store into a destination dir,
    // skipping everything at or below a checkpoint at offset 99
    import spark.implicits._
    val ckptStore = graft.sources.FsCheckpointStore(spark, s"$storeDir-ckstore")
    ckptStore.commit(Seq.range(0, graft.operators.MessageFraming.NumPartitions)
      .map(p => (p, 99L)).toDF("part_id", "ckpt_offset"))
    val destDir = s"$storeDir-replayed"
    val schema = store.open("src", "events", after)
      .drop("start_offset", "end_offset", "seg_level", "seg_part").schema
    val q = graft.streaming.StreamingIngress.fileReplay(
      spark, store.root, "src", "events", schema, ckptStore, destDir, s"$storeDir-ckpt")
    q.processAllAvailable(); q.stop()
    val replayed = spark.read.parquet(destDir)
    println(s"[demo] streamed replay past checkpoint 99: ${replayed.count()} messages, " +
      s"min offset ${replayed.agg(min("msg_offset")).head.getLong(0)}")
    spark.stop()
  }
}
