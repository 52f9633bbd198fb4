package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sources.FsKeyIndex
import graft.streaming.StreamingCuration

/** ST6: continuous dedup ingest — cross-batch key visibility through
  * the durable index, restart-resume, and idempotent batch replay.
  */
class StreamingCurationSpec extends SparkSuite {

  private def corpus(dir: String): Set[(Long, String, Long)] =
    spark.read.parquet(dir)
      .select("doc_id", "text", "n_batch_dupes").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("streaming ingest dedups each batch against all earlier batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-curation")
    val idx = FsKeyIndex(spark, s"$root/index")
    val input = MemoryStream[(Long, String)]
    val q = StreamingCuration.dedupIngest(
      input.toDS().toDF("doc_id", "text"), idx,
      s"$root/corpus", s"$root/ckpt")
    try {
      input.addData(1L -> "alpha", 2L -> "beta", 3L -> "alpha")
      q.processAllAvailable()
      assert(corpus(s"$root/corpus") ===
        Set((1L, "alpha", 2L), (2L, "beta", 1L)))
      // batch 2: alpha + beta already ingested; only gamma's rep lands
      input.addData(10L -> "alpha", 11L -> "gamma", 12L -> "gamma", 13L -> "beta")
      q.processAllAvailable()
      assert(corpus(s"$root/corpus") ===
        Set((1L, "alpha", 2L), (2L, "beta", 1L), (11L, "gamma", 2L)))
    } finally q.stop()
    // a NEW query lineage (fresh checkpoint → fresh corpus segment,
    // per the operator contract) still dedups against every earlier
    // ingest: the index is durable state, not query state
    val input2 = MemoryStream[(Long, String)]
    val q2 = StreamingCuration.dedupIngest(
      input2.toDS().toDF("doc_id", "text"), FsKeyIndex(spark, s"$root/index"),
      s"$root/corpus2", s"$root/ckpt2")
    try {
      input2.addData(20L -> "gamma", 21L -> "delta")
      q2.processAllAvailable()
      assert(corpus(s"$root/corpus2") === Set((21L, "delta", 1L)))
    } finally q2.stop()
    assert(FsKeyIndex(spark, s"$root/index").keys().count() === 4)
  }

  test("replaying a batch is idempotent: partition rewrite, no duplicate rows") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-curation-replay")
    val idx = FsKeyIndex(spark, s"$root/index")
    val input = MemoryStream[(Long, String)]
    val q = StreamingCuration.dedupIngest(
      input.toDS().toDF("doc_id", "text"), idx,
      s"$root/corpus", s"$root/ckpt")
    try {
      input.addData(1L -> "alpha", 2L -> "beta")
      q.processAllAvailable()
    } finally q.stop()
    // crash-replay of batch 0: a NEW query from a FRESH checkpoint
    // re-delivers the same data as its own batch 0 — the keys are
    // already in the index, but the partition overwrite + distinct
    // key view keep corpus and index unchanged... UNLESS the replay
    // batch re-elects (index already has the keys → zero survivors →
    // the empty write touches no partition). Either way: no dupes.
    val input2 = MemoryStream[(Long, String)]
    val q2 = StreamingCuration.dedupIngest(
      input2.toDS().toDF("doc_id", "text"), FsKeyIndex(spark, s"$root/index"),
      s"$root/corpus", s"$root/ckpt-replayed")
    try {
      input2.addData(1L -> "alpha", 2L -> "beta")
      q2.processAllAvailable()
    } finally q2.stop()
    assert(corpus(s"$root/corpus") === Set((1L, "alpha", 1L), (2L, "beta", 1L)))
    assert(FsKeyIndex(spark, s"$root/index").keys().count() === 2)
  }
}
