package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Portable._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All arithmetic is
  * integer/ratio-of-integers so the DuckDB oracle matches exactly.
  */
object TextAnalysis {

  /** (lang, marker word) table for the stopword-marker language ID. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "and", "en" -> "of",
    "de" -> "der", "de" -> "und", "de" -> "das", "de" -> "die",
    "fr" -> "le", "fr" -> "et", "fr" -> "la", "fr" -> "les",
    "es" -> "el", "es" -> "y", "es" -> "los", "es" -> "de")

  val Stopwords: Seq[String] = Seq(
    "the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

  /** doc_id + exploded normalized whitespace tokens (with multiplicity). */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(normText(col("text")), " ")).as("tok"))

  /** Language ID: count marker-word hits per language, pick the argmax
    * (ties → lexicographically first language); no hits → "und".
    */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val markers = LangMarkers.toDF("cand_lang", "marker")
    val hits = tokens(docs)
      .join(broadcast(markers), col("tok") === col("marker"))
      .groupBy("doc_id", "cand_lang").agg(count(lit(1)).as("n_hits"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("n_hits").desc, col("cand_lang"))
    val best = hits.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("doc_id", "cand_lang", "n_hits")
    docs.select("doc_id", "lang")
      .join(best, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("cand_lang"), lit("und")).as("pred_lang"),
        col("lang").as("actual_lang"),
        coalesce(col("n_hits"), lit(0L)).as("marker_hits"))
  }

  /** Quality score: four 25-point gates on word count, mean word
    * length, stopword ratio, and alpha ratio. Ratios are int/int
    * divisions — bit-identical across engines.
    */
  def qualityScore(docs: DataFrame): DataFrame =
    withQuality(docs).select("doc_id", "wc", "sw_hits", "avg_wlen_x10", "score")

  /** The shared scoring projection behind [[qualityScore]] and
    * [[sourceQuality]]: every input column plus the gate inputs and the
    * score — one zero-shuffle pass, so per-source rollups don't pay a
    * doc_id re-join against the scored table.
    */
  private def withQuality(docs: DataFrame): DataFrame = {
    val sw = Stopwords
    val norm = normText(col("text"))
    val toks = split(norm, " ")
    docs
      .withColumn("wc", size(toks).cast("long"))
      .withColumn("letters", length(regexp_replace(norm, " ", "")).cast("long"))
      .withColumn("sw_hits",
        size(filter(toks, t => t.isInCollection(sw))).cast("long"))
      .withColumn("alpha_len",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("long"))
      .withColumn("text_len", length(col("text")).cast("long"))
      .withColumn("avg_wlen_x10", expr("(letters * 10) div wc"))
      .withColumn("score",
        (when(col("wc").between(20, 1000), 25).otherwise(0)
          + when(col("avg_wlen_x10").between(30, 100), 25).otherwise(0)
          + when(col("sw_hits") * 100 >= col("wc") * 5, 25).otherwise(0)
          + when(col("alpha_len") * 100 >= col("text_len") * 60, 25).otherwise(0)
        ).cast("int"))
  }

  /** Per-source quality report card — the third leg of the per-source
    * observability trio (P9 measures composition, D16 measures
    * duplication, this measures QUALITY): which sources a curation run
    * should downweight, before any doc is dropped. Per source: doc
    * count, mean score ×100 (integer), full-score and zero-score doc
    * counts, the share clearing the curation gate (score ≥ 50, the P1
    * threshold family) in basis points, and mean word count. All
    * integer arithmetic over ONE partial-aggregating groupBy of the
    * shared scoring projection — source strata are domain-bounded, the
    * funnel is |sources| rows.
    */
  def sourceQuality(docs: DataFrame): DataFrame =
    withQuality(docs)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(score) * 100 div count(1)").as("mean_score_x100"),
        sum(when(col("score") === 100, 1L).otherwise(0L)).as("n_full"),
        sum(when(col("score") === 0, 1L).otherwise(0L)).as("n_zero"),
        expr("sum(CASE WHEN score >= 50 THEN 1 ELSE 0 END) * 10000 div count(1)")
          .as("share_ge50_bp"),
        expr("sum(wc) div count(1)").as("mean_wc"))

  /** Token counting: whitespace tokens + BPE-ish regex subword tokens. */
  /** GPT-2-shaped pre-tokenizer pattern (RE2-safe, shared verbatim
    * with the DuckDB oracle): contractions, space-prefixed letter and
    * digit runs, punctuation runs — the split a byte-pair encoder
    * refines, so its count tracks BPE token counts far closer than a
    * whitespace split does.
    */
  val BpePattern = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"

  /** THE whitespace-token rule (tokens of the normalized text) — the
    * one definition every budget consumer shares: T3's ws column,
    * T18's proxy column, and packing's default
    * ([[graft.operators.Curation.packSequences]]).
    */
  val wsTokens: Column => Column =
    c => size(split(normText(c), " ")).cast("long")

  /** THE BPE-token rule (greedy merges over the normalized text) —
    * shared by T18's gated column and the BPE packing twin.
    */
  def bpeTokens(table: BpeTable = Bpe.default): Column => Column =
    c => Bpe.tokenCount(normText(c), table)

  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      wsTokens(col("text")).as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit(BpePattern), lit(0)))
        .cast("long").as("subword_tokens"))

  /** Tokenizer-TRUE token counts (the T3 upgrade): real BPE merges
    * over the normalized words ([[Bpe]] — a GPT-2-format merge table
    * trained on the repo corpus), next to the whitespace count for
    * the proxy-error observable. Training-data budgets (P2 packing,
    * P10 audits, P11 curricula) should budget in THESE tokens; the
    * regex row stays as the cheap screen. Pure projection inside
    * whole-stage codegen, merge table shipped once per executor.
    */
  def tokenCountBpe(docs: DataFrame,
      table: BpeTable = Bpe.default): DataFrame =
    docs.select(
      col("doc_id"),
      wsTokens(col("text")).as("ws_tokens"),
      bpeTokens(table)(col("text")).as("bpe_tokens"))

  /** Trainer-consumable token-id sequences (the T18 completion): the
    * same merge loop as [[tokenCountBpe]], emitting `array<int>` ids
    * through the table's derived vocabulary instead of a count —
    * what a training job actually loads from a shard. One codegen
    * projection, zero shuffles; `size(ids)` equals the count column
    * on every document (spec-pinned), so every budget computed from
    * counts holds for the sequences verbatim.
    */
  def tokenizeIds(docs: DataFrame,
      table: BpeTable = Bpe.default): DataFrame =
    docs.select(
      col("doc_id"),
      Bpe.tokenIds(normText(col("text")), table).as("ids"))

  /** The production-shaped tokenizer gate (T18 at table scale): the
    * BYTE-LEVEL expression ([[Bpe.countTokensBytes]] — GPT-2 byte
    * encoder, arbitrary input) over the id+text stream, whose doc_id
    * numerals make the trained digit merges fire — the prose
    * vocabulary alone exercises ~90 of the 2000 rules. Same plan
    * shape as [[tokenCountBpe]]: one codegen projection, zero
    * shuffles, table shipped once per executor.
    */
  def tokenCountBpeProd(docs: DataFrame,
      table: BpeTable = Bpe.default): DataFrame =
    docs.select(
      col("doc_id"),
      Bpe.tokenCountBytes(
        concat_ws(" ", col("doc_id").cast("string"), col("text")), table)
        .as("bpe_tokens"))

  /** T20: per-language tokenizer-fit report — the fertility table a
    * multilingual pipeline reads before fixing a vocabulary or a
    * mixture: per language, document count, raw character volume,
    * whitespace words, tokenizer-true BPE tokens, and the two derived
    * integer ratios — fertility (BPE tokens per 100 whitespace words)
    * and compression (characters per 100 BPE tokens). A language
    * whose fertility sits far above the corpus norm is being shredded
    * by the vocabulary — its text costs more training budget per word
    * — the standard signal for rebalancing vocab size or data mixture.
    *
    * Pure composition at scale: the [[tokenCountBpe]] codegen
    * projection (merge table shipped once per executor, zero shuffle)
    * plus ONE partial-aggregated groupBy(lang) — group count = number
    * of languages, never corpus-scale. Ratios are exact integer div
    * (zero-word groups guarded to null), so the report hash-gates
    * cross-engine.
    */
  def tokenizerFit(docs: DataFrame,
      table: BpeTable = Bpe.default): DataFrame =
    docs.select(col("lang"), col("n_chars"),
        wsTokens(col("text")).as("ws"),
        bpeTokens(table)(col("text")).as("bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars"),
        sum("ws").as("ws_tokens"),
        sum("bpe").as("bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("n_chars"),
        col("ws_tokens"), col("bpe_tokens"),
        expr("case when ws_tokens = 0 then null else bpe_tokens * 100 div ws_tokens end")
          .as("fertility_pct"),
        expr("case when bpe_tokens = 0 then null else n_chars * 100 div bpe_tokens end")
          .as("chars_per_tok_pct"))

  /** Heavy hitters: top-N corpus tokens by frequency (deterministic
    * tiebreak). One shuffle on token; at 100 TB the partial (map-side)
    * aggregation collapses per-executor counts before the shuffle.
    */
  def topTokens(docs: DataFrame, n: Int): DataFrame = {
    graft.core.Validation.validate("top-tokens",
      graft.core.Validation.knob("n", n, minV = 1L))
    tokens(docs)
      .groupBy("tok")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("tok"))
      .limit(n)
  }

  /** Deterministic train/validation/test split: bucket = 60-bit
    * content-independent hash of the doc id mod 100, so the assignment
    * is stable under corpus growth, reshuffling, and re-runs — any
    * worker on any cluster computes the same split for the same doc
    * (the property a training pipeline needs; a random() split has
    * none of it). Pure projection: no shuffle at all.
    */
  def sampleSplit(docs: DataFrame, trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    graft.core.Configs.Split(trainPct, valPct).validated
    docs.select(col("doc_id"),
        (hexHash60(col("doc_id").cast("string")) % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "validation")
          .otherwise("test"))
  }

  /** TF-IDF-weighted top terms per document, in exact integer
    * arithmetic: score = tf * ((N * 1000) div df) — the idf factor is
    * the integer surrogate N*1000/df (monotone in the true log-idf for
    * ranking within a document's terms at these scales) so both
    * engines agree bit-for-bit; a float log would flake the hash gate.
    * One token shuffle + one broadcast-joined df table + one window.
    */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 3): DataFrame = {
    val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    val tf = tokens(docs).groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok"))
    tf.join(df, Seq("tok"))
      .crossJoin(nDocs)
      .withColumn("score", expr("tf * ((n_docs * 1000) div df)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("rnk").cast("int").as("rnk"),
        col("tok"), col("score"))
  }

  /** T17: DSIR-shaped importance-weighted data selection (Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling" — hashed n-gram importance weights): score every
    * document by how much MORE likely its features are under a TARGET
    * distribution than under the raw corpus, and keep the documents
    * the target prefers. Features are the paper's hashed n-grams —
    * unigrams + bigrams of the normalized tokens, bucketed by the
    * shared portable 60-bit hash into `numBuckets` counts — and the
    * per-bucket weight is an integer-exact Laplace-smoothed
    * likelihood-ratio surrogate:
    *
    *   w(g) = (c_tgt(g)+1)·S div (tot_tgt+B) − (c_raw(g)+1)·S div (tot_raw+B)
    *
    * i.e. the (smoothed, 10⁻⁹-granular) probability DIFFERENCE rather
    * than the paper's log ratio — `log` is not bit-portable across
    * engines, and the difference keeps the same sign per bucket and
    * the same keep/drop behavior at the ≥ 0 margin. A document's
    * score is Σ over its grams (with multiplicity) of w(g); `kept` is
    * score ≥ 0 ("at least as target-like as raw-average"). The target
    * here is a language stratum (the corpus' own labels); production
    * would pass any labeled exemplar set the same way.
    *
    * Scale: one projection explodes grams carrying an is-target flag
    * (target membership never joins the corpus), ONE shuffle builds
    * the (doc, bucket) count table — partial-aggregated map-side, a
    * doc's grams are co-located by construction — from which BOTH the
    * numBuckets-row weight table (second partial agg, bucket-scale)
    * and the per-doc rollup derive; the weight table joins back as a
    * BROADCAST, and identical subplans share the (doc, bucket)
    * exchange via ReuseExchange. Nothing corpus-scale moves twice.
    */
  /** The per-bucket DSIR weight over columns (c_tgt, c_raw, tot_tgt,
    * tot_raw). The numerator (c + 1) * S is computed in
    * DECIMAL(38,0): a Long would wrap silently past
    * c_raw ~ 9.2e9 — certain at web scale (~4e13 grams / 1024
    * buckets ~ 4e10 per bucket) — while the DuckDB oracle raises on
    * BIGINT overflow. `div` truncates the decimal quotient back to
    * BIGINT, and each quotient is <= S by construction, so the
    * output type and every in-range value are unchanged (the oracle
    * runs the same widening via HUGEINT).
    */
  private[graft] def dsirWeight(S: Long, numBuckets: Int): Column =
    expr(s"CAST(c_tgt + 1 AS DECIMAL(38,0)) * $S div (tot_tgt + $numBuckets)") -
      expr(s"CAST(c_raw + 1 AS DECIMAL(38,0)) * $S div (tot_raw + $numBuckets)")

  def dsirSelect(docs: DataFrame, targetLang: String = "en",
      numBuckets: Int = 1024): DataFrame = {
    val S = 1000000000L
    val a = split(normText(col("text")), " ")
    val bigrams = zip_with(
      slice(a, lit(1), size(a) - 1), slice(a, lit(2), size(a) - 1),
      (x, y) => concat(x, lit("_"), y))
    // the gram explode + per-gram md5 below is the operator's
    // dominant CPU cost — balance it across cores when the doc scan
    // under-splits (Dedup.cpuBalanced: no-op at cluster scale)
    val grams = graft.operators.Dedup.cpuBalanced(docs)
      .select(col("doc_id"),
        (col("lang") === targetLang).cast("long").as("is_tgt"),
        explode(concat(a, bigrams)).as("gram"))
      .select(col("doc_id"), col("is_tgt"),
        (hexHash60(col("gram")) % numBuckets).as("g"))
    // materialize the (doc, bucket) counts ONCE: three consumers
    // (bucket counts, totals, per-doc scores) would otherwise each
    // re-run the gram explode + per-gram md5 — the dominant cost — as
    // separate subplans (the shared-spine idiom of recallTable; a
    // long-lived pipeline would .persist() the same table)
    val dg = grams.groupBy("doc_id", "g")
      .agg(max("is_tgt").as("is_tgt"), count(lit(1)).as("c"))
      .localCheckpoint()
    val counts = dg.groupBy("g")
      .agg(sum("c").as("c_raw"), sum(expr("c * is_tgt")).as("c_tgt"))
    // the numerator (c + 1) * S is computed in DECIMAL(38,0): a Long
    // would wrap silently past c_raw ~ 9.2e9 — certain at web scale
    // (~4e13 grams / 1024 buckets ~ 4e10 per bucket) — while the
    // oracle engine raises on BIGINT overflow. `div` truncates the
    // decimal quotient back to BIGINT, and the quotient is <= S by
    // construction, so the output type and every in-range value are
    // unchanged (the oracle runs the same widening via HUGEINT).
    val weights = broadcast(counts
      .crossJoin(broadcast(counts.agg(sum("c_raw").as("tot_raw"),
        sum("c_tgt").as("tot_tgt"))))
      .select(col("g"), dsirWeight(S, numBuckets).as("w")))
    val scores = dg.join(weights, Seq("g"))
      .groupBy("doc_id").agg(sum(expr("c * w")).as("score"))
    docs.select("doc_id", "lang")
      .join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("score"), lit(0L)).as("score"),
        (coalesce(col("score"), lit(0L)) >= 0).cast("long").as("kept"))
  }

  /** The hashed n-gram feature array of a document — unigrams +
    * bigrams of the normalized tokens bucketed into `numBuckets` by
    * the portable 60-bit hash, kept as a PER-ROW ARRAY (T17's gram
    * universe without the explode), so consumers can reduce over it
    * in one codegen pass.
    */
  private def gramBuckets(numBuckets: Int): Column = {
    val a = split(normText(col("text")), " ")
    val bigrams = zip_with(
      slice(a, lit(1), size(a) - 1), slice(a, lit(2), size(a) - 1),
      (x, y) => concat(x, lit("_"), y))
    transform(concat(a, bigrams), g => hexHash60(g) % numBuckets)
  }

  /** T21: train the learned quality classifier (the FineWeb-Edu
    * shape — Penedo et al. 2024 score documents with a small learned
    * classifier and keep the high scorers): a LINEAR scorer over the
    * T17 hashed n-gram bucket features, trained on a hash-elected
    * labeled stratum, returned as a dense `numBuckets`-long integer
    * weight vector — parameter-scale DRIVER state like the k-means
    * centroids, portable/broadcastable to any serving pass.
    *
    * Training is closed-form multinomial Naive Bayes in the engine's
    * integer-exact surrogate form: per bucket g,
    *
    *   w(g) = (c_pos(g)+1)·S div (tot_pos+B) − (c_neg(g)+1)·S div (tot_neg+B)
    *
    * — the Laplace-smoothed class-conditional probability DIFFERENCE
    * (the [[dsirWeight]] rule with the language target swapped for
    * quality labels; log-free so both engines agree bit-for-bit, and
    * the keep margin at 0 means "more positive-class-like than
    * negative"). Labels on the stratum come from the T2 heuristic
    * gate (`score == 100` — the full-gate documents are the
    * 'edu-grade' exemplars, ~55/45 at the test scales): weak
    * supervision in the FineWeb manner, where an upstream signal
    * labels a stratum and the learned model generalizes it
    * corpus-wide; production would feed any labeled exemplar frame
    * the same way. Stratum membership is the T6 deterministic hash
    * split (doc_id hash % 100 < trainPct) — reproducible under
    * reshuffling and corpus growth.
    *
    * Scale: ONE partial-aggregating groupBy of the stratum's gram
    * buckets (bucket-scale output, ≤ numBuckets rows collected);
    * numerators widen through BigInt driver-side (a Long wraps past
    * c ~ 9.2e9 — certain at web scale), quotients are ≤ S by
    * construction so the weights are plain Longs. Buckets unseen in
    * the stratum get the smoothing-only weight, never a silent 0.
    */
  def qualityModelTrain(docs: DataFrame, trainPct: Int = 50,
      numBuckets: Int = 1024): Seq[Long] = {
    graft.core.Validation.validate("quality-model",
      graft.core.Validation.knob("trainPct", trainPct.toLong, minV = 1L,
        maxV = 100L) ++
        graft.core.Validation.knob("numBuckets", numBuckets.toLong,
          minV = 2L, maxV = 1048576L))
    // Memoize the trained weight vector per (session, corpus,
    // trainPct, numBuckets) — the Ann centroid-memo shape: training is
    // one corpus-stratum aggregation whose deterministic, parameter-
    // scale result (numBuckets longs) was re-derived by every consumer
    // (t_quality_model serving AND the model-driven keeper election).
    val fk = graft.operators.Dedup.corpusKey(docs)
    val key = (fk._1, fk._2, trainPct, numBuckets)
    qmLatch.getOrElseUpdate(key, new Object).synchronized {
      val hit = qmMemo.synchronized {
        qmMemo.remove(key).map { v => qmMemo.put(key, v); v }
      }
      hit.getOrElse {
        val v = qualityModelTrainUncached(docs, trainPct, numBuckets)
        qmMemo.synchronized {
          qmMemo.put(key, v)
          val mine = qmMemo.keys.filter(_._1 == key._1).toSeq
          mine.dropRight(QmMemoBound).foreach { k0 =>
            qmMemo.remove(k0); qmLatch.remove(k0)
          }
        }
        v
      }
    }
  }

  /** Per-session entry bound for the quality-model memo (weights are
    * a few KB each; the bound only caps stale keys from dead frames).
    */
  val QmMemoBound = 32
  private val qmMemo = scala.collection.mutable.LinkedHashMap.empty[
    (org.apache.spark.sql.SparkSession, String, Int, Int), Seq[Long]]
  private val qmLatch = scala.collection.concurrent.TrieMap.empty[
    (org.apache.spark.sql.SparkSession, String, Int, Int), Object]

  /** Drop every memoized quality-model weight vector for `spark`. */
  def releaseQualityModels(spark: org.apache.spark.sql.SparkSession): Unit =
    qmMemo.synchronized {
      qmMemo.keys.filter(_._1 == spark).toSeq
        .foreach { k => qmMemo.remove(k); qmLatch.remove(k) }
    }

  private def qualityModelTrainUncached(docs: DataFrame, trainPct: Int,
      numBuckets: Int): Seq[Long] = {
    val S = 1000000000L
    // per-gram hashing over the train stratum is the trainer's CPU
    // cost — balance when the scan under-splits (memo key upstream is
    // computed from the UNbalanced docs, so consumers sharing the
    // memo never fork)
    val counts = withQuality(graft.operators.Dedup.cpuBalanced(docs))
      .filter(hexHash60(col("doc_id").cast("string")) % 100 < trainPct)
      .select((col("score") === 100).cast("long").as("lbl"),
        explode(gramBuckets(numBuckets)).as("g"))
      .groupBy("g")
      .agg(sum(col("lbl")).as("c_pos"),
        sum(lit(1L) - col("lbl")).as("c_neg"))
      .collect()
    val cp = Array.fill(numBuckets)(0L)
    val cn = Array.fill(numBuckets)(0L)
    counts.foreach { r =>
      val g = r.getLong(0).toInt
      cp(g) = r.getLong(1); cn(g) = r.getLong(2)
    }
    val totPos = cp.sum; val totNeg = cn.sum
    Array.tabulate(numBuckets) { g =>
      val p = (BigInt(cp(g)) + 1) * S / (totPos + numBuckets)
      val n = (BigInt(cn(g)) + 1) * S / (totNeg + numBuckets)
      (p - n).toLong
    }.toSeq
  }

  /** T21 serving: score every document under a trained
    * [[qualityModelTrain]] weight vector — ONE zero-shuffle codegen
    * projection: score(doc) = Σ_grams w[bucket(gram)] via a per-row
    * `aggregate` over the gram array (no explode, no shuffle, no
    * join; the weight vector rides as a literal array), which is what
    * lets the trained artifact serve 100 TB at scan speed. Output per
    * doc: stratum membership, the heuristic label (for agreement
    * audits), the integer model score, and the keep decision
    * (`m_score >= 0`).
    */
  def qualityModelScore(docs: DataFrame, weights: Seq[Long],
      trainPct: Int = 50): DataFrame = {
    val wlit = typedLit(weights)
    withQuality(docs)
      .select(col("doc_id"),
        (hexHash60(col("doc_id").cast("string")) % 100 < trainPct)
          .cast("long").as("in_train"),
        (col("score") === 100).cast("long").as("lbl"),
        aggregate(gramBuckets(weights.size), lit(0L),
          (acc, g) => acc + element_at(wlit, (g + 1).cast("int")))
          .as("m_score"))
      .withColumn("pred", (col("m_score") >= 0).cast("long"))
  }

  /** Per-group quota sampling: keep at most `quota` documents per
    * source, elected by content-independent hash order — the
    * per-domain cap every web-scale corpus applies, deterministic
    * under reshuffling and incremental growth (a doc's rank can only
    * move if new docs hash ahead of it). One window, no data movement
    * beyond the source shuffle.
    */
  def quotaSample(docs: DataFrame, quota: Int = 5): DataFrame = {
    graft.core.Validation.validate("quota-sample",
      graft.core.Validation.knob("quota", quota, minV = 1L))
    // pre-reduce per (partition, source) before the global window: a
    // row in the global top-`quota` has local rank ≤ quota in ANY
    // partitioning (deleting rows never raises a survivor's rank), so
    // the final per-source window sees ≤ #partitions × quota rows —
    // a hot domain is never a one-task funnel at 100 TB
    val keyed = docs.select(col("source"), col("doc_id"),
      hexHash60(col("doc_id").cast("string")).as("hash_rank"))
    val localW = Window.partitionBy(spark_partition_id(), col("source"))
      .orderBy(col("hash_rank"), col("doc_id"))
    val w = Window.partitionBy("source")
      .orderBy(col("hash_rank"), col("doc_id"))
    keyed
      .withColumn("local_rnk", row_number().over(localW))
      .filter(col("local_rnk") <= quota)
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= quota)
      .select("source", "rnk", "doc_id")
  }

  /** Repetition signals per document — the Gopher-style filters a
    * training pipeline screens boilerplate and spam with: token count,
    * distinct-token count, the most frequent token's count, the total
    * occurrences of duplicated bigrams, and the unique-token ratio in
    * basis points. Everything — including the bp ratio — is pure
    * integer arithmetic (`* 10000 div`), so the oracle matches
    * exactly (a rounded double would flake on .5 boundaries: Spark
    * rounds HALF_UP, DuckDB half-even).
    *
    * Scale: two shuffles, both keyed by doc_id (token counts and
    * bigram counts partial-aggregate map-side before the exchange);
    * the bigram list is a per-row projection (`transform` over the
    * token array), never a corpus-wide join.
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), split(normText(col("text")), " ").as("w"))
    val tc = toks.select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_unique"),
        max("cnt").as("top_tok_n"))
    // sequence(1, size-1) is DESCENDING when size=1 — guard to an
    // empty bigram list for single-token docs.
    val bigrams = toks.select(col("doc_id"),
      explode(when(size(col("w")) >= 2,
          transform(sequence(lit(1), size(col("w")) - 1),
            i => concat(element_at(col("w"), i), lit(" "),
              element_at(col("w"), i + 1))))
        .otherwise(array().cast("array<string>"))).as("bg"))
    val dup = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(coalesce(sum(when(col("n") >= 2, col("n"))), lit(0L))
        .as("dup_bigram_occ"))
    tc.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_unique"), col("top_tok_n"),
        coalesce(col("dup_bigram_occ"), lit(0L)).as("dup_bigram_occ"),
        expr("(n_unique * 10000) div n_tokens").as("uniq_bp"))
  }

  /** Unigram-LM perplexity proxy — the CCNet-shaped statistical
    * quality filter: score each document by the mean inverse corpus
    * frequency of its token occurrences,
    * `ppl_proxy = (Σ_occ (total_occ*1000) div n_occ(tok)) div n_tokens`.
    * High score = rare-token-heavy (high-perplexity) text; low = stock
    * phrasing. Pure integer arithmetic (no log/double), so the oracle
    * matches bit-for-bit; the integer surrogate is order-equivalent to
    * mean −log p(tok) for filtering thresholds.
    *
    * Scale: the frequency table is one token-keyed partial-aggregated
    * shuffle (|vocab| rows out); scoring joins occurrences to it on
    * `tok` — hot stopword keys sit on the probe side of the hash join
    * (no post-join token aggregation), so the skew AQE splits is the
    * worst case; the final rollup shuffles on doc_id.
    */
  def perplexityProxy(docs: DataFrame): DataFrame = {
    val toks = tokens(docs)
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("n_occ"))
    val total = toks.agg(count(lit(1)).as("total_occ"))
    toks.join(freq, Seq("tok"))
      .crossJoin(broadcast(total))
      .withColumn("inv", expr("(total_occ * 1000) div n_occ"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("inv").as("inv_sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("inv_sum div n_tokens").as("ppl_proxy"))
  }

  /** Polynomial rolling fingerprint over token hashes:
    * fp = foldl(0, (acc, t) => (acc*31 + h20(t)) mod (2^31-1)).
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val toks = split(normText(col("text")), " ")
    val hashed = transform(toks, t => hexHash20(t))
    docs.select(
      col("doc_id"),
      aggregate(hashed, lit(0L),
        (acc, h) => (acc * 31L + h) % 2147483647L).as("fingerprint"))
  }

  /** PII patterns, RE2-safe (no backtracking constructs) so the exact
    * same strings compile in Spark's Java regex AND the oracle's RE2 —
    * shared verbatim with the DuckDB SQL. Deliberately simple
    * recall-oriented shapes (the standard curation trade-off: a
    * redactor must over-match, never under-match).
    */
  val PiiEmailRe = "[a-z0-9._]+@[a-z0-9-]+\\.[a-z]+"
  val PiiPhoneRe = "555-[0-9]{4}"
  val PiiIpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII detection + redaction — the scrubbing pass every public-web
    * training corpus runs (RefinedWeb/Dolma mask emails, phone
    * numbers, and IPs before release): per document, count matches of
    * each PII class, then rewrite the text with class placeholders.
    * Redaction order is fixed (email → phone → ip) so later patterns
    * scan the already-masked text — deterministic and identical in the
    * oracle, and an email's host can never be re-matched as a
    * bare domain/IP.
    *
    * Output: `(doc_id, n_email, n_phone, n_ip, red_len, red_hash)` —
    * the 60-bit hash of the redacted text, so the oracle verifies the
    * exact rewritten document, not just match counts.
    *
    * Scale: a pure per-row projection — zero shuffle, zero join; the
    * regexes are native codegen `RLIKE`-family expressions, so the
    * pass fuses into whatever scan precedes it.
    */
  def piiRedact(docs: DataFrame): DataFrame = {
    val redacted = regexp_replace(regexp_replace(regexp_replace(
      col("text"),
      PiiEmailRe, "<EMAIL>"),
      PiiPhoneRe, "<PHONE>"),
      PiiIpRe, "<IP>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(PiiEmailRe), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(regexp_replace(col("text"), PiiEmailRe, "<EMAIL>"),
        lit(PiiPhoneRe), lit(0))).cast("long").as("n_phone"),
      size(regexp_extract_all(regexp_replace(regexp_replace(col("text"),
          PiiEmailRe, "<EMAIL>"), PiiPhoneRe, "<PHONE>"),
        lit(PiiIpRe), lit(0))).cast("long").as("n_ip"),
      length(redacted).cast("long").as("red_len"),
      hexHash60(redacted).as("red_hash"))
  }
}
