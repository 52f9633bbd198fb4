package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, BpeTable, Portable, TextAnalysis}

/** T18: real BPE token counts — greedy merge-loop semantics, chain
  * convergence, the embedded trained table, and the codegen
  * expression against a driver recount.
  */
class BpeSpec extends SparkSuite {

  private def table(pairs: (String, String)*): BpeTable =
    new BpeTable(pairs.toArray)

  test("greedy merge loop: rank order decides, chains merge left-to-right") {
    val t = table(("a", "a"), ("aa", "b"), ("b", "c"))
    // [a,a,a,b] -> (a,a) once -> [aa,a,b]; no pair remains
    assert(Bpe.countTokens("aaab", t) === 3L)
    // [a,a,a,a,b,c] -> [aa,aa,b,c] -> rank 1 (aa,b) BEFORE rank 2
    // (b,c): [aa,aab,c] — wrong order would give [aa,aa,bc]
    assert(Bpe.countTokens("aaaabc", t) === 3L)
    // chain of four: two non-overlapping merges in one pass
    assert(Bpe.countTokens("aaaa", t) === 2L)
    // untouched word: one token per char
    assert(Bpe.countTokens("xyz", t) === 3L)
    // words independent; single chars and empties
    assert(Bpe.countTokens("aaab xyz a", t) === 3L + 3L + 1L)
    assert(Bpe.countTokens("", t) === 0L)
    assert(Bpe.countTokens("   ", t) === 0L)
  }

  test("a merged symbol never re-forms its own pair") {
    // (a,b)->ab: [a,b,b] merges once, the new 'ab' + 'b' is NOT (a,b)
    val t = table(("a", "b"))
    assert(Bpe.countTokens("abb", t) === 2L)
    assert(Bpe.countTokens("abab", t) === 2L) // both pairs, one pass
  }

  test("embedded trained table loads and is topologically ordered") {
    val t = Bpe.default
    assert(t.size === 48)
    // every composite's parts were merged earlier (the property the
    // cross-engine convergence argument relies on): for each pair
    // (a, b), any multi-char side must itself be an earlier merge
    val seen = scala.collection.mutable.Set.empty[String]
    graft.functions.BpeMergesData.lines.foreach { l =>
      val Array(a, b) = l.split(" ", 2)
      Seq(a, b).filter(_.length > 1).foreach { s =>
        assert(seen.contains(s),
          s"composite '$s' used before being formed (line '$l')")
      }
      seen += (a + b)
    }
  }

  test("codegen expression equals a driver recount on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = TextAnalysis.tokenCountBpe(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = docs.select(col("doc_id"),
        Portable.normText(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> Bpe.countTokens(r.getString(1), Bpe.default))
      .toMap
    assert(got === want)
    // and the BPE count compresses: never more tokens than characters,
    // never fewer than whitespace words
    val both = TextAnalysis.tokenCountBpe(docs).collect()
    both.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"doc ${r.getLong(0)}: fewer BPE tokens than words")
    }
  }
}
