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
}
