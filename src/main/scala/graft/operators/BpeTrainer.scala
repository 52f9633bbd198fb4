package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Distributed BPE merge-table TRAINING — the corpus-scale twin of
  * `graft.tools.TrainBpe` (which collects the whole corpus to the
  * driver: fine for regenerating the embedded table, not a 100 TB
  * shape). Training is classic pair-frequency BPE (Sennrich et al.
  * 2016): count adjacent symbol pairs over the word multiset, merge
  * the most frequent, repeat. Here the WORD TABLE stays distributed —
  * the corpus-scale pass is one token-count groupBy, and each merge
  * iteration is one partial-aggregated pair groupBy + a TakeOrdered
  * argmax (1 collected row — parameter scale, the k-means discipline)
  * + one zero-shuffle `replace` projection.
  *
  * Segmentations are carried as DOUBLE-SPACE-delimited symbol strings
  * with single-space word boundaries (`" a  b  c "`): each symbol owns
  * its leading and trailing space, so the merge pattern `" a  b "`
  * never consumes a neighboring occurrence's delimiter and ONE
  * non-overlapping left-to-right `replace` call is EXACTLY the
  * classic trainer's single greedy merge pass — including on runs of
  * a repeated symbol (`a a a a a` → `aa aa a`, never `aa a aa`),
  * where a single-space encoding diverges. The DuckDB oracle replays
  * training over the SAME string representation (generated
  * iteration CTEs, binary collation = JVM string order on this
  * [a-z0-9] alphabet), so the argmax chain is verified cross-engine
  * end to end.
  *
  * Training units match TrainBpe exactly: the corpus's normalized-text
  * words plus the doc_id decimal strings (the numerals supply the
  * combinatorial diversity the 31-word synthetic prose lacks —
  * see BpeMergesData). Ties on pair frequency break by MAX pair
  * string, which on a space-delimited pair equals the (left, right)
  * lexicographic tuple order because ' ' sorts below every symbol
  * character.
  *
  * Scale: vocab is |distinct words| rows regardless of corpus size;
  * each iteration's pair table partial-aggregates map-side; lineage
  * is checkpointed every 64 merges so a production 2000-merge
  * training never replans a 2000-deep expression chain.
  */
object BpeTrainer {
  /** Train `nMerges` merges; returns (rank, lhs, rhs) — rank = merge
    * order, the GPT-2 interchange table in DataFrame form. Stops
    * early if the vocabulary runs out of pairs.
    */
  def trainMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    graft.core.Validation.validate("bpe-train",
      graft.core.Validation.knob("nMerges", nMerges, minV = 1L,
        maxV = 65536L))
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(normText(col("text")), " ")).as("w"))
      .unionByName(docs.select(col("doc_id").cast("string").as("w")))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // materialize the word table ONCE: every iteration's pair count
    // otherwise replays the corpus-scale token groupBy from lineage —
    // 24 merges re-scanned the corpus 24 times (measured 29.6 s at
    // sf0.1; vocab-from-checkpoint trains the same table in a few)
    var vocab = words.select(
      concat(lit(" "),
        trim(regexp_replace(col("w"), "(.)", "$1  ")), lit(" ")).as("ws"),
      col("cnt"))
      .localCheckpoint(eager = true)
    // the checkpointed frame whose blocks the NEXT checkpoint releases
    var lastCkpt = vocab
    val merges = Seq.newBuilder[(Int, String, String)]
    var i = 0
    var dry = false
    while (i < nMerges && !dry) {
      val top = vocab
        .withColumn("syms", split(trim(col("ws")), "  "))
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "j -> concat(element_at(syms, j), ' ', element_at(syms, j + 1)))"))
          .as("p"), col("cnt"))
        .groupBy("p").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("p").desc)
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val Array(a, b) = top.head.getString(0).split(" ", 2)
        merges += ((i, a, b))
        // symbols are [a-z0-9]+ (normText alphabet + digit ids), so
        // inlining them in a SQL literal is quote-safe
        vocab = vocab.withColumn("ws",
          expr(s"replace(ws, ' $a  $b ', ' $a$b ')"))
        if ((i + 1) % 64 == 0) {
          // release the PREVIOUS checkpoint's blocks once the new one
          // has materialized (eager = the new copy exists before the
          // unpersist): without this a 2000-merge run pins ~31 full
          // copies of the word table in executor storage
          vocab = vocab.localCheckpoint(eager = true)
          lastCkpt.unpersist()
          lastCkpt = vocab
        }
        i += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "lhs", "rhs")
  }
}
