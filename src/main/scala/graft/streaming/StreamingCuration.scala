package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.Portable._
import graft.operators.Curation
import graft.sources.FsKeyIndex

/** ST6: continuous corpus ingestion with durable cross-batch dedup —
  * the streaming form of [[Curation.incrementalDedupIndexed]]. Each
  * micro-batch elects its within-batch representatives, drops every
  * document whose content key ANY earlier batch ingested (via the
  * persisted [[FsKeyIndex]]), appends the surviving documents to the
  * corpus sink, and only then records their keys.
  *
  * Exactly-once output under foreachBatch's at-least-once replay,
  * without a two-sink transaction:
  *  - the corpus write is IDEMPOTENT: survivors land in an
  *    `ingest_batch=<id>` partition via dynamic partition overwrite,
  *    so a replayed batch rewrites its own partition instead of
  *    appending duplicates;
  *  - the index add is IDEMPOTENT: [[FsKeyIndex.keys]] is a distinct
  *    view, so re-appending a replayed batch's keys changes nothing;
  *  - ORDER: output BEFORE index. A crash between the two replays the
  *    batch with the index unchanged — the same survivors are
  *    re-elected (hash + min-doc_id election is deterministic) and the
  *    partition is rewritten identically. The reverse order would
  *    re-elect zero survivors on replay and lose the batch's output.
  *
  * Scale: per micro-batch cost is batch ⋈ key-index (8 bytes per
  * accepted doc ever), never corpus × corpus — the same incremental
  * shape as the batch operator, continuously.
  */
object StreamingCuration {

  /** Start the ingest: `docs` is a streaming DataFrame with at least
    * (doc_id: long, text: string); all columns are preserved in the
    * corpus sink, plus `n_batch_dupes` and the `ingest_batch`
    * partition column.
    *
    * Contract: `corpusDir` is owned by ONE checkpoint lineage — batch
    * ids (the partition keys) are unique only within a checkpoint, so
    * a restart must reuse `checkpointDir` (resuming batch numbering);
    * a fresh checkpoint lineage takes a fresh corpus segment dir. The
    * shared `index` is durable across lineages — that is what carries
    * dedup state between them.
    */
  def dedupIngest(docs: DataFrame, index: FsKeyIndex, corpusDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val keyed = batch.select(col("doc_id"),
          hexHash60(normText(col("text"))).as("k"))
        // localCheckpoint BEFORE any sink mutates: a lazy plan
        // re-evaluated after the index add would see its own keys
        val survivors = Curation.dedupBatch(keyed, index.keys())
          .localCheckpoint()
        survivors
          .join(batch, Seq("doc_id"))
          .drop("k", "rn")
          .withColumn("ingest_batch", lit(batchId))
          .write
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .partitionBy("ingest_batch")
          .parquet(corpusDir)
        index.add(survivors.select("k"))
      }
      .start()
}
