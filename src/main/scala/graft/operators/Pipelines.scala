package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** End-to-end corpus curation — the flagship composition every
  * LLM-training pipeline runs before a corpus ships, built entirely
  * from the engine's own operators:
  *
  *   quality gate → language filter → near-dup cluster keepers →
  *   benchmark decontamination → deterministic train/val/test split
  *
  * Each stage is the already-oracled operator (no re-implementation),
  * so the composed result is oracle-checkable end to end. The join
  * spine is doc_id throughout — one shuffle key — and the exclusion
  * sets (contaminated docs, benchmark docs) are corpus-fraction-small,
  * so the anti-joins broadcast at any scale.
  */
object Pipelines {

  def curatedCorpus(docs: DataFrame, minQuality: Int, langs: Seq[String],
      minJaccardBp: Long, isBenchmark: Column): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs)
      .filter(col("score") >= minQuality)
      .select("doc_id", "score")
    val lang = TextAnalysis.langId(docs)
      .filter(col("pred_lang").isin(langs: _*))
      .select("doc_id", "pred_lang")
    val keepers = Dedup.dedupClusters(docs, minJaccardBp)
      .filter(col("keep") === 1).select("doc_id")
    val contaminated = Dedup.contamination(docs, isBenchmark)
      .select("doc_id")
    val benchDocs = docs.select("doc_id").where(isBenchmark)
    val split = TextAnalysis.sampleSplit(docs).select("doc_id", "split")
    docs.select("doc_id")
      .join(quality, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      .join(broadcast(benchDocs), Seq("doc_id"), "left_anti")
      .join(split, Seq("doc_id"))
      .select("doc_id", "pred_lang", "score", "split")
  }

  /** Per-stage drop accounting for [[curatedCorpus]] — the lineage
    * report a production pipeline ships next to the corpus (every doc
    * in, exactly one fate out): each document is attributed to the
    * FIRST stage that rejects it, in pipeline order (`fail_quality` →
    * `fail_lang` → `dup_dropped` → `contaminated` → `benchmark`), or
    * to `kept_<split>`. Fates partition the corpus exactly — the
    * audit's row counts must sum to |docs|, and the `kept_*` rows must
    * reproduce [[curatedCorpus]]'s output set (both pinned in
    * PipelineE2ESpec); `id_sum` makes the partition content-checkable,
    * not just cardinality-checkable.
    *
    * Scale: the same per-stage operators and the same doc_id join
    * spine as the pipeline itself, with verdicts carried as columns
    * instead of filters; the exclusion sets broadcast as in
    * [[curatedCorpus]]; the final rollup has ≤ 8 groups.
    */
  def curationAudit(docs: DataFrame, minQuality: Int, langs: Seq[String],
      minJaccardBp: Long, isBenchmark: Column): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs).select("doc_id", "score")
    val lang = TextAnalysis.langId(docs).select("doc_id", "pred_lang")
    val keepers = Dedup.dedupClusters(docs, minJaccardBp)
      .filter(col("keep") === 1)
      .select(col("doc_id"), lit(true).as("is_keeper"))
    val contaminated = Dedup.contamination(docs, isBenchmark)
      .select(col("doc_id"), lit(true).as("is_contam"))
    val benchDocs = docs.where(isBenchmark)
      .select(col("doc_id"), lit(true).as("is_bench"))
    val split = TextAnalysis.sampleSplit(docs).select("doc_id", "split")
    docs.select("doc_id")
      .join(quality, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .join(keepers, Seq("doc_id"), "left")
      .join(broadcast(contaminated), Seq("doc_id"), "left")
      .join(broadcast(benchDocs), Seq("doc_id"), "left")
      .join(split, Seq("doc_id"))
      .withColumn("fate",
        when(col("score") < minQuality, lit("fail_quality"))
          .when(!col("pred_lang").isin(langs: _*), lit("fail_lang"))
          .when(col("is_keeper").isNull, lit("dup_dropped"))
          .when(col("is_contam").isNotNull, lit("contaminated"))
          .when(col("is_bench").isNotNull, lit("benchmark"))
          .otherwise(concat(lit("kept_"), col("split"))))
      .groupBy("fate")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
  }
}
