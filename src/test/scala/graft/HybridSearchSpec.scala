package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, HybridSearch}
import graft.sources.Tables

/** A15 — RRF hybrid retrieval semantics and plan shape. */
class HybridSearchSpec extends SparkSuite {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val emb = Tables.embeddings(spark, sf)

  test("RRF fusion: both-list documents outrank single-list ones at equal ranks") {
    val out = HybridSearch.hybridTopK(docs, emb, numQueries = 5, k = 10)
      .collect()
    assert(out.nonEmpty)
    // integer contract: every score is the sum of its two terms
    out.foreach { r =>
      val (lex, vec, score) = (r.getAs[Long]("lex_rank"),
        r.getAs[Long]("vec_rank"), r.getAs[Long]("rrf_score"))
      val lexTerm = if (lex < 0) 0L else 1000000000000L / (60L + lex)
      val vecTerm = if (vec < 0) 0L else 1000000000000L / (60L + vec)
      assert(score === lexTerm + vecTerm, r.toString)
      assert(lex >= 0 || vec >= 0, "row in neither list")
    }
    // a document holding rank r in BOTH lists must outscore any
    // document holding rank r in only one (1/(60+r) + positive > same
    // single term) — check via the scores just validated
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (_, rows) =>
      val both = rows.filter(r => r.getAs[Long]("lex_rank") >= 0 &&
        r.getAs[Long]("vec_rank") >= 0)
      val single = rows.filter(r => r.getAs[Long]("lex_rank") < 0 ||
        r.getAs[Long]("vec_rank") < 0)
      for (b <- both; s <- single
           if s.getAs[Long]("lex_rank").max(s.getAs[Long]("vec_rank")) >=
             b.getAs[Long]("lex_rank").max(b.getAs[Long]("vec_rank")))
        assert(b.getAs[Long]("rrf_score") > s.getAs[Long]("rrf_score"))
    }
  }

  test("vector leg matches knnBruteForce ranks; lexical leg is idf-weighted") {
    val out = HybridSearch.hybridTopK(docs, emb, numQueries = 5, k = 10)
      .filter(col("vec_rank") >= 0)
      .select("q_id", "doc_id", "vec_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Ann.knnBruteForce(emb, 5, 20)
      .select("q_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    // every fused row that carries a vec_rank got it from the exact
    // brute-force top-20 (the fused top-10 may not exhaust it)
    assert(out.subsetOf(brute), (out -- brute).take(3).toString)
  }

  test("plan: query tokens broadcast, no cartesian product") {
    // the lexical leg (r20: memoized per corpus and fused as a local
    // relation) is audited on its own plan — query tokens broadcast
    // into the corpus token join, an equi BroadcastHashJoin
    val lex = HybridSearch.lexLegPlan(docs, 5, 20)
      .queryExecution.executedPlan.toString
    assert(lex.contains("BroadcastHashJoin"), lex.take(2000))
    assert(!lex.contains("CartesianProduct"), lex.take(2000))
    val plan = HybridSearch.hybridTopK(docs, emb, 5, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("IVF leg: fused vec ranks come from knnIvfTrained; same plan discipline") {
    val out = HybridSearch.hybridTopKIvf(docs, emb, numQueries = 5, k = 10)
      .filter(col("vec_rank") >= 0)
      .select("q_id", "doc_id", "vec_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = Ann.knnIvfTrained(emb, 5, 20)
      .select("q_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    // every fused vec_rank is the probe-bounded leg's rank, verbatim
    assert(out.subsetOf(ivf), (out -- ivf).take(3).toString)
    assert(out.nonEmpty)

    // the probe-bounded leg genuinely replaces the brute-force one:
    // on this corpus at probes=1 the two legs disagree somewhere, so
    // the IVF row needs (and has) its own oracle
    val brute = Ann.knnBruteForce(emb, 5, 20)
      .select("q_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(ivf !== brute)

    // same broadcast/no-cartesian discipline as the brute-force form:
    // centroids and query sides broadcast, candidate scan never
    // pairs corpus x corpus
    val plan = HybridSearch.hybridTopKIvf(docs, emb, 5, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("bad knobs speak the uniform validation language") {
    intercept[graft.core.Validation.GraftConfigException] {
      HybridSearch.hybridTopK(docs, emb, 5, 10, topN = 0)
    }
    intercept[graft.core.Validation.GraftConfigException] {
      HybridSearch.hybridTopK(docs, emb, 0, 10)
    }
  }
}
