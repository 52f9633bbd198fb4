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
  * Layout: `root/region=R/topic=T/part=P/level=L/start=S/end=E/part-*.parquet`
  * — one directory per segment, holding that segment's parquet file(s).
  * Every path component is key=value so a `partitionBy` writer can emit
  * MANY segments in one distributed job (compaction, streaming egress)
  * while `list()` stays a driver-side metadata LIST (exactly the
  * reference's S3 LIST). Against S3 the same code runs with
  * `root = s3a://bucket/prefix`.
  *
  * Scale notes (the 100 TB contract):
  *   - [[open]] is ONE multi-path parquet scan for any number of
  *     segments; identity columns are derived from `input_file_name()`
  *     — no per-segment DataFrame, no N-way union, plan size O(1).
  *   - [[compact]] plans bins from metadata, then runs ONE read +
  *     ONE partitioned write for ALL bins — not a job pair per bin.
  *   - Writes use dynamic partition overwrite, so a replayed batch or
  *     re-run compaction overwrites its own segment dirs (idempotent
  *     redelivery) without touching sibling segments.
  */
class FsSegmentStore(spark: SparkSession, val root: String) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def segmentPath(m: SegmentMeta): String =
    s"$root/region=${m.region}/topic=${m.topic}/part=${m.partId}/level=${m.level}/start=${m.startOffset}/end=${m.endOffset}"

  /** Write one segment: the message rows as one storage object
    * (coalesce(1)) like the reference's single S3 object per segment.
    * Segment identity lives in the directory key, not in the data.
    */
  def write(messages: DataFrame, meta: SegmentMeta): Unit =
    messages
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
      startDir <- children(levelDir)
      endDir <- children(startDir)
    } yield SegmentMeta(
      region = region, topic = topic,
      partId = partDir.getName.stripPrefix("part=").toInt,
      level = levelDir.getName.stripPrefix("level=").toInt,
      startOffset = startDir.getName.stripPrefix("start=").toLong,
      endOffset = endDir.getName.stripPrefix("end=").toLong,
      messageCount = -1L, sizeBytes = -1L)
  }

  /** Open the listed segments of a (region, topic) as one DataFrame
    * with segment identity columns (`seg_part`, `seg_level`,
    * `start_offset`, `end_offset`) — the relational view downstream
    * operators (replay, compaction) consume.
    *
    * ONE scan node regardless of segment count: all segment dirs go
    * into a single multi-path parquet read and identity is parsed from
    * `input_file_name()`, so the physical plan stays O(1) at 10⁵
    * segments (a per-segment union was a driver/plan-size bottleneck).
    */
  def open(region: String, topic: String, segments: Seq[SegmentMeta]): DataFrame = {
    require(segments.nonEmpty, "no segments to open")
    val paths = segments.map(segmentPath)
    val file = input_file_name()
    spark.read.parquet(paths: _*)
      .withColumn("seg_part", regexp_extract(file, "/part=(\\d+)/", 1).cast("int"))
      .withColumn("seg_level", regexp_extract(file, "/level=(\\d+)/", 1).cast("int"))
      .withColumn("start_offset", regexp_extract(file, "/start=(\\d+)/", 1).cast("long"))
      .withColumn("end_offset", regexp_extract(file, "/end=(\\d+)/", 1).cast("long"))
  }

  /** Inventory with store-side metadata — the reference's SegmentInfo
    * (pkg/formats/s3_parquet.go: Segment + store {timestamp, size}):
    * sizeBytes = sum of the segment dir's file lengths, createdEpoch =
    * newest file mtime in seconds. Still a driver-side metadata LIST.
    */
  def listInfo(region: String, topic: String): Seq[FsSegmentStore.SegmentInfo] = {
    val f = fs
    list(region, topic).map { m =>
      val files = f.listStatus(new Path(segmentPath(m))).filter(_.isFile)
      FsSegmentStore.SegmentInfo(
        m.copy(sizeBytes = files.map(_.getLen).sum),
        createdEpoch = if (files.isEmpty) 0L
          else files.map(_.getModificationTime).max / 1000L)
    }
  }

  def delete(m: SegmentMeta): Unit = {
    fs.delete(new Path(segmentPath(m)), true); ()
  }

  /** Bulk segment write: rows already labeled with their output
    * segment (`part`, `level`, `start`, `end` columns) land in the
    * store layout via ONE dynamic-partition-overwrite job — one file
    * per segment dir (repartition by segment key). This is the scale
    * path shared by compaction and streaming egress.
    */
  def writePartitioned(labeled: DataFrame, region: String, topic: String): Unit =
    labeled
      .withColumn("region", lit(region))
      .withColumn("topic", lit(topic))
      .repartition(col("part"), col("start"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("region", "topic", "part", "level", "start", "end")
      .parquet(root)

  /** Compact level-`level` segments of one (region, topic): merge every
    * run of up to `maxSegments` contiguous segments (at least
    * `minSegments`) into a level+1 segment, per-offset dedup, then
    * delete the inputs (reference: pkg/compaction/compactor.go:115-160,
    * output level = max input level + 1, optional delete).
    *
    * Contiguity mirrors [[graft.operators.Compactor.plan]]: only the
    * contiguous prefix of each partition is binned — the reference
    * refuses to merge across a missing offset range (compactor.go:219
    * HasOffset error), because a gap absorbed into a merged segment's
    * [start,end] would become invisible to GapDetector. Post-gap
    * segments stay in place until the gap resolves. Overlap
    * (at-least-once rewinds) is tolerated: running-max(end) contiguity
    * plus per-offset dedup.
    *
    * Execution is ONE read over all bin inputs + ONE partitioned write
    * of all merged segments, not a driver loop of per-bin jobs.
    */
  def compact(region: String, topic: String, level: Int,
      minSegments: Int, maxSegments: Int): Seq[SegmentMeta] = {
    val inventory = list(region, topic).filter(_.level == level)
    val bins = planBins(inventory, minSegments, maxSegments)
    if (bins.isEmpty) return Seq.empty

    val spark0 = spark
    import spark0.implicits._
    val inputs = bins.flatMap(_.inputs)
    // (part, input start, input end) -> output segment key
    val binMap = bins.flatMap { b =>
      b.inputs.map(m => (m.partId, m.startOffset, m.endOffset,
        b.startOffset, b.endOffset))
    }.toDF("seg_part", "start_offset", "end_offset", "out_start", "out_end")

    val merged = open(region, topic, inputs)
      .join(broadcast(binMap), Seq("seg_part", "start_offset", "end_offset"))
      .dropDuplicates("seg_part", "out_start", "msg_offset")
      .cache() // two actions: per-bin counts + the partitioned write
    val counts = merged.groupBy("seg_part", "out_start")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Int]("seg_part"), r.getAs[Long]("out_start")) -> r.getAs[Long]("n"))
      .toMap

    writePartitioned(
      merged
        .drop("start_offset", "end_offset", "seg_level")
        .withColumn("part", col("seg_part")).drop("seg_part")
        .withColumn("level", lit(level + 1))
        .withColumnRenamed("out_start", "start")
        .withColumnRenamed("out_end", "end"),
      region, topic)
    merged.unpersist()

    bins.flatMap(_.inputs).foreach(delete)
    bins.map { b =>
      SegmentMeta(region, topic, b.partId, level + 1, b.startOffset, b.endOffset,
        messageCount = counts.getOrElse((b.partId, b.startOffset), 0L),
        sizeBytes = -1L)
    }
  }

  /** Full leveled compaction against the store — the reference's
    * executable compactor (pkg/compaction/compactor.go:114-163:
    * create → copy in offset order skipping compacted offsets → close
    * → delete inputs), with candidate selection delegated to
    * [[graft.operators.Compactor.planLeveledFlags]] so the store
    * executes EXACTLY the oracle-gated planner semantics: level range,
    * MinSegmentAge, resume past higher-level coverage, contained-
    * segment consumption, count/byte caps (inclusive crossing),
    * min-count/min-bytes skip, stop-at-gap.
    *
    * One merged segment per partition per run at
    * level = max(consumed level) + 1. Execution stays ONE read over
    * all consumed inputs + ONE partitioned write (no per-bin jobs);
    * messages at or below a higher-level resume point are skipped
    * (already compacted), duplicates deduped per offset.
    */
  def compactLeveled(region: String, topic: String, minLevel: Int,
      maxLevel: Int, minAgeSec: Long, nowEpoch: Long, minSegments: Int,
      maxSegments: Int, minBytes: Long, maxBytes: Long,
      deleteInputs: Boolean = true): Seq[SegmentMeta] = {
    val spark0 = spark
    import spark0.implicits._
    val inv = listInfo(region, topic)
    if (inv.isEmpty) return Seq.empty
    val segDf = inv.map { i =>
      (i.meta.partId, i.meta.level, i.meta.startOffset, i.meta.endOffset,
        i.meta.sizeBytes, i.createdEpoch)
    }.toDF("part_id", "level", "start_offset", "end_offset", "seg_bytes",
      "created_epoch")
    val flags = graft.operators.Compactor
      .planLeveledFlags(segDf, minLevel, maxLevel, minAgeSec, nowEpoch,
        maxSegments, maxBytes)
      .select("part_id", "level", "start_offset", "end_offset", "seg_bytes",
        "resume_end", "included", "consumed")
      .collect() // metadata-scale: one row per eligible segment

    val byMeta = inv.map(i => (i.meta.partId, i.meta.level,
      i.meta.startOffset, i.meta.endOffset) -> i.meta).toMap
    val bins = flags.groupBy(_.getAs[Int]("part_id")).toSeq.flatMap {
      case (partId, rows) =>
        val included = rows.filter(_.getAs[Boolean]("included"))
        val inBytes = included.map(_.getAs[Long]("seg_bytes")).sum
        if (included.length < minSegments || inBytes < minBytes) None
        else {
          val consumed = rows.filter(_.getAs[Boolean]("consumed")).map { r =>
            byMeta((partId, r.getAs[Int]("level"),
              r.getAs[Long]("start_offset"), r.getAs[Long]("end_offset")))
          }
          val resumeEnd = rows.head.getAs[Any]("resume_end") match {
            case null => -1L; case v: Long => v
          }
          val start =
            if (resumeEnd >= 0) resumeEnd + 1
            else included.map(_.getAs[Long]("start_offset")).min
          val end = included.map(_.getAs[Long]("end_offset")).max
          val outLevel = consumed.map(_.level).max + 1
          Some(FsSegmentStore.LeveledBin(partId, start, end, outLevel,
            consumed.toSeq))
        }
    }
    if (bins.isEmpty) return Seq.empty

    val inputs = bins.flatMap(_.inputs)
    val binMap = bins.flatMap { b =>
      b.inputs.map(m => (m.partId, m.startOffset, m.endOffset,
        b.startOffset, b.endOffset, b.level))
    }.toDF("seg_part", "start_offset", "end_offset", "out_start", "out_end",
      "out_level")
    val merged = open(region, topic, inputs)
      .join(broadcast(binMap), Seq("seg_part", "start_offset", "end_offset"))
      // skip offsets already covered by higher-level segments (resume)
      .filter(col("msg_offset").between(col("out_start"), col("out_end")))
      .dropDuplicates("seg_part", "msg_offset") // one bin per partition
      .cache()
    val counts = merged.groupBy("seg_part").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Int]("seg_part") -> r.getAs[Long]("n")).toMap

    writePartitioned(
      merged
        .drop("start_offset", "end_offset", "seg_level")
        .withColumn("part", col("seg_part")).drop("seg_part")
        .withColumnRenamed("out_level", "level")
        .withColumnRenamed("out_start", "start")
        .withColumnRenamed("out_end", "end"),
      region, topic)
    merged.unpersist()

    // reference Config.Delete: keeping inputs is an operator choice
    // (e.g. verify-before-delete deployments)
    if (deleteInputs) inputs.foreach(delete)
    bins.map { b =>
      SegmentMeta(region, topic, b.partId, b.level, b.startOffset, b.endOffset,
        messageCount = counts.getOrElse(b.partId, 0L), sizeBytes = -1L)
    }
  }

  /** Driver-side bin planning over the (metadata-scale) inventory:
    * per partition, sort by (start, end), keep only the contiguous
    * prefix (stop at the first gap past the running max end), group
    * greedily into runs of `maxSegments`, drop runs below
    * `minSegments`.
    */
  private def planBins(inventory: Seq[SegmentMeta], minSegments: Int,
      maxSegments: Int): Seq[FsSegmentStore.Bin] =
    inventory.groupBy(_.partId).toSeq.sortBy(_._1).flatMap { case (partId, segs) =>
      val sorted = segs.sortBy(m => (m.startOffset, m.endOffset))
      var runMax = Long.MinValue
      val prefix = sorted.takeWhile { m =>
        val contiguous = runMax == Long.MinValue || m.startOffset <= runMax + 1
        if (contiguous) runMax = math.max(runMax, m.endOffset)
        contiguous
      }
      prefix.grouped(maxSegments)
        .filter(_.size >= minSegments)
        .map(run => FsSegmentStore.Bin(partId, run.head.startOffset,
          run.map(_.endOffset).max, run))
        .toSeq
    }
}

object FsSegmentStore {
  /** One planned compaction bin: its output segment key + inputs. */
  case class Bin(partId: Int, startOffset: Long, endOffset: Long,
      inputs: Seq[SegmentMeta])

  /** One leveled-run output: key, output level, consumed inputs. */
  case class LeveledBin(partId: Int, startOffset: Long, endOffset: Long,
      level: Int, inputs: Seq[SegmentMeta])

  /** Segment + store-side metadata (reference SegmentInfo). */
  case class SegmentInfo(meta: SegmentMeta, createdEpoch: Long)

  def apply(spark: SparkSession, root: String) = new FsSegmentStore(spark, root)
}
