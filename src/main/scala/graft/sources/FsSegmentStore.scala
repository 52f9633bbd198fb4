package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SegmentMeta

/** Filesystem/object-store segment store
  * (reference: pkg/stores/s3_segment_store.go — key layout
  * `region/topic/partition/level/start-end`; pkg/core/core.go:56
  * SegmentStore interface: Create/Open/ListSegments/Delete).
  *
  * Layout: `root/region=R/topic=T/part=P/level=L/START-END/part-*.parquet`
  * — one directory per segment, holding that segment's parquet file(s).
  * `list()` is a driver-side metadata LIST (exactly the reference's S3
  * LIST); reads/writes are distributed parquet IO. Against S3 the same
  * code runs with `root = s3a://bucket/prefix`.
  */
class FsSegmentStore(spark: SparkSession, val root: String) {
  import FsSegmentStore._

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def segmentPath(m: SegmentMeta): String =
    f"$root/region=${m.region}/topic=${m.topic}/part=${m.partId}/level=${m.level}/${m.startOffset}%020d-${m.endOffset}%020d"

  /** Write one segment: the message rows + embedded metadata columns.
    * A segment is one storage object (coalesce(1)) like the reference's
    * single S3 object per segment.
    */
  def write(messages: DataFrame, meta: SegmentMeta): Unit =
    messages
      .withColumn("level", lit(meta.level))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(segmentPath(meta))

  /** Driver-side segment inventory from the directory layout (the S3
    * LIST analogue). Returns a local Seq — segment counts are O(files),
    * metadata-scale, not data-scale.
    */
  def list(region: String, topic: String): Seq[SegmentMeta] = {
    val base = new Path(s"$root/region=$region/topic=$topic")
    if (!fs.exists(base)) return Seq.empty
    val f = fs
    def children(p: Path): Seq[Path] =
      f.listStatus(p).filter(_.isDirectory).map(_.getPath).toSeq
    for {
      partDir <- children(base).toSeq
      levelDir <- children(partDir)
      segDir <- children(levelDir)
      name = segDir.getName
      Array(s, e) = name.split("-")
    } yield SegmentMeta(
      region = region, topic = topic,
      partId = partDir.getName.stripPrefix("part=").toInt,
      level = levelDir.getName.stripPrefix("level=").toInt,
      startOffset = s.toLong, endOffset = e.toLong,
      messageCount = -1L, sizeBytes = -1L)
  }

  /** Open every listed segment of a (region, topic) as one DataFrame
    * with segment identity columns — the relational view downstream
    * operators (replay, compaction) consume.
    */
  def open(region: String, topic: String, segments: Seq[SegmentMeta]): DataFrame = {
    require(segments.nonEmpty, "no segments to open")
    val dfs = segments.map { m =>
      spark.read.parquet(segmentPath(m))
        .withColumn("start_offset", lit(m.startOffset))
        .withColumn("end_offset", lit(m.endOffset))
        .withColumn("seg_level", lit(m.level))
    }
    dfs.reduce(_ unionByName _)
  }

  def delete(m: SegmentMeta): Unit = {
    fs.delete(new Path(segmentPath(m)), true); ()
  }

  /** Compact level-`level` segments of one (region, topic): merge every
    * run of up to `maxSegments` contiguous segments (at least
    * `minSegments`) into a level+1 segment, per-offset dedup, then
    * delete the inputs (reference: pkg/compaction/compactor.go:115-160,
    * output level = max input level + 1, optional delete).
    */
  def compact(region: String, topic: String, level: Int,
      minSegments: Int, maxSegments: Int): Seq[SegmentMeta] = {
    val inventory = list(region, topic).filter(_.level == level)
    val byPart = inventory.groupBy(_.partId)
    val out = for {
      (partId, segs) <- byPart.toSeq
      bin <- segs.sortBy(_.startOffset).grouped(maxSegments)
      if bin.size >= minSegments
    } yield {
      val merged = open(region, topic, bin)
        .dropDuplicates("msg_offset")
        .sortWithinPartitions("msg_offset")
        .cache() // two actions below: count + write
      // endOffset = max over inputs, NOT bin.last's: overlapping
      // segments (at-least-once rewinds) can end before an earlier one
      val meta = SegmentMeta(region, topic, partId, level + 1,
        bin.head.startOffset, bin.map(_.endOffset).max,
        messageCount = merged.count(), sizeBytes = -1L)
      write(merged.drop("start_offset", "end_offset", "seg_level", "level"), meta)
      merged.unpersist()
      bin.foreach(delete)
      meta
    }
    out
  }
}

object FsSegmentStore {
  def apply(spark: SparkSession, root: String) = new FsSegmentStore(spark, root)
}
