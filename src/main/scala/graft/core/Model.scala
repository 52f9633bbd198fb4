package graft.core

import java.sql.Timestamp

/** Data model re-expressing the reference's protobuf/Parquet records
  * (reference: pkg/core/messages.pb.go:52-235, pkg/formats/s3_parquet.go:106)
  * as Spark-encodable case classes.
  *
  * A replicated Kafka message. `partition`/`offset` are the source
  * coordinates; `sizeBytes` mirrors core.Message.Size()
  * (reference: pkg/core/core.go:136 — key + value + header lengths).
  */
case class KMessage(
    region: String,
    topic: String,
    partId: Int,
    msgOffset: Long,
    key: String,
    value: String,
    ts: Timestamp,
    sizeBytes: Long)

/** Segment identity + metadata, the unit of storage and compaction
  * (reference: pkg/core/messages.pb.go:52, pkg/formats/s3_parquet.go:37-44).
  * `level` 0 = streaming; compaction outputs level = max(input)+1.
  */
case class SegmentMeta(
    region: String,
    topic: String,
    partId: Int,
    level: Int,
    startOffset: Long,
    endOffset: Long,
    messageCount: Long,
    sizeBytes: Long)

/** Latest consumed offset per source partition
  * (reference: pkg/stores/checkpoint_store.go — compacted-topic semantics).
  */
case class Checkpoint(region: String, topic: String, partId: Int, offset: Long)

/** A contiguous range of offsets declared lost after late-segment retries
  * are exhausted (reference: pkg/ingress/worker.go:105-130).
  */
case class LostRange(partId: Int, lostStart: Long, lostEnd: Long, lostCount: Long)
