package graft.core

/** Segment identity + metadata, the unit of storage and compaction
  * (reference: pkg/core/messages.pb.go:52, pkg/formats/s3_parquet.go:37-44).
  * `level` 0 = streaming; compaction outputs level = max(input)+1.
  *
  * The message frame itself (reference: pkg/core/messages.pb.go:183 —
  * key, value, partition, offset, timestamp; `msg_size` mirrors
  * core.Message.Size() at pkg/core/core.go:136) lives as DataFrame
  * columns `(part_id, msg_offset, key, msg_value, ts, msg_size)`
  * produced by `MessageFraming` / `KafkaBridge.toMessages`; streaming
  * code uses the typed `graft.streaming.StreamMessage`. Checkpoints
  * are `(part_id, ckpt_offset)` rows (latest-per-key = compacted-topic
  * semantics), lost ranges `(part_id, lost_start, lost_end,
  * lost_count)` rows — see Checkpoints / GapDetector.
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
