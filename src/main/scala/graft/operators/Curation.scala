package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Portable._

/** Corpus-shaping operators a training pipeline runs after filtering:
  * packing documents into fixed-token-budget training sequences,
  * resampling to a target language mixture, and deduplicating an
  * incoming batch against the already-ingested corpus.
  *
  * All election/ordering decisions are content- or id-hash-derived
  * (never `rand()`), so every operator is deterministic under
  * reshuffling, retries, and incremental growth — and exactly
  * reproducible by the DuckDB oracle.
  */
object Curation {

  /** Pack documents into fixed-token-budget training sequences,
    * GPT-style concat-then-chunk: order documents deterministically,
    * run a cumulative token count, and assign each document to the
    * sequence its first token lands in (`(cum - n_tok) div budget`).
    *
    * Parallelism comes from sharding: documents are hash-partitioned
    * into `shards` independent streams and packed within each shard,
    * so the only ordered scan is per-shard. At 100 TB, shards is set
    * to O(corpus bytes / executor memory) and each shard's window
    * sorts one partition — there is no global sort. Output is the
    * per-sequence manifest (doc count + token count).
    */
  def packSequences(docs: DataFrame, budget: Int = 256,
      shards: Int = 8): DataFrame = {
    val d = docs.select(col("doc_id"),
      size(split(normText(col("text")), " ")).cast("long").as("n_tok"),
      (hexHash20(col("doc_id").cast("string")) % shards).as("shard"),
      hexHash60(normText(col("text"))).as("ord_h"))
    val w = Window.partitionBy("shard").orderBy("ord_h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    d.withColumn("cum", sum("n_tok").over(w))
      .withColumn("seq_id", expr(s"(cum - n_tok) div ${budget.toLong}"))
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
  }

  /** Default target language mixture, in basis points of the budget. */
  val DefaultShares: Seq[(String, Long)] =
    Seq("en" -> 3000L, "es" -> 2000L, "fr" -> 2000L, "de" -> 1500L, "zh" -> 1500L)

  /** Resample the corpus toward a target language mixture: each
    * language gets `target_n = min(n_lang, total * share_bp / 20000)`
    * documents (shares are bp of a half-corpus budget), and documents
    * are elected by content-hash threshold —
    * `h20(text) * n_lang < 2^20 * target_n` — i.e. keep-probability
    * target_n/n_lang, decided per document with no coordination.
    *
    * Scale: the per-language stats are one tiny aggregate broadcast
    * back; election is then a pure filter on the scan — no rank, no
    * per-language global sort, no skew (vs a row_number election,
    * which funnels each language through one reducer). Counts are
    * approximate (binomial around target_n) exactly like production
    * hash-rate samplers; the election is reshuffle-stable and
    * duplicate-consistent (identical texts elect together).
    */
  def mixtureResample(docs: DataFrame,
      shares: Seq[(String, Long)] = DefaultShares): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sharesDf = shares.toDF("lang", "share_bp")
    val total = docs.agg(count(lit(1)).as("n_total"))
    val tgt = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      .join(broadcast(sharesDf), Seq("lang"))
      .crossJoin(broadcast(total))
      .withColumn("target_n",
        least(col("n_lang"), expr("(n_total * share_bp) div 20000")))
      .select("lang", "n_lang", "target_n")
    val kept = docs.select(col("lang"), hexHash20(normText(col("text"))).as("h"))
      .join(broadcast(tgt), Seq("lang"))
      .filter(col("h") * col("n_lang") < lit(1048576L) * col("target_n"))
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    tgt.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_lang"), col("target_n"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Deduplicate an incoming batch against the already-ingested
    * corpus: a batch document survives iff (a) its normalized-text
    * hash is the batch's minimum-doc_id representative and (b) the
    * hash does not already exist in the corpus. `isNew` partitions
    * the input into batch vs corpus (in production the corpus side is
    * the ingested key index, not a rescan).
    *
    * Scale: both sides reduce to 60-bit keys before any join; the
    * within-batch election is one window over the key and the
    * corpus check is a left-anti equi-join on the key — the classic
    * incremental-ingest shape (new-batch ⋈ key-index), never
    * corpus × corpus.
    */
  def incrementalDedup(docs: DataFrame, batchMod: Int = 4): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      hexHash60(normText(col("text"))).as("k"),
      (hexHash20(col("doc_id").cast("string")) % batchMod === 0).as("is_new"))
    val corpusKeys = keyed.filter(!col("is_new")).select("k").distinct()
    val w = Window.partitionBy("k").orderBy("doc_id")
    keyed.filter(col("is_new"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_batch_dupes", count(lit(1)).over(Window.partitionBy("k")))
      .filter(col("rn") === 1)
      .join(corpusKeys, Seq("k"), "left_anti")
      .select(col("doc_id"), col("n_batch_dupes"))
  }
}
