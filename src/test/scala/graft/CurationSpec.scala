package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{Portable, TextAnalysis}
import graft.operators.{Ann, Curation}
import graft.sources.Tables

/** Value-level specs for the curation / training-loop operators
  * (each also carries a DuckDB oracle in SparkEntry.oracleSql; these
  * pin the semantics against independent in-test reference
  * implementations and hand-computed corpora).
  */
class CurationSpec extends SparkSuite {

  private def docs = Tables.documents(spark, sf)
  private def emb = Tables.embeddings(spark, sf)

  private def sameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("packSequences two-level prefix sum == single global per-shard cumsum") {
    // reference: ONE window over the whole shard (the plan shape the
    // two-level decomposition exists to avoid, but the same math)
    val d = docs.select(col("doc_id"),
      size(split(Portable.normText(col("text")), " ")).cast("long").as("n_tok"),
      (Portable.hexHash20(col("doc_id").cast("string")) % 8).as("shard"),
      Portable.hexHash60(Portable.normText(col("text"))).as("ord_h"))
    val w = Window.partitionBy("shard").orderBy("ord_h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = d.withColumn("cum", sum("n_tok").over(w))
      .withColumn("seq_id", expr("(cum - n_tok) div 256"))
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    assert(sameRows(Curation.packSequences(docs, 256, 8, blockBits = 5), expected))
    // blockBits changes the decomposition, never the result
    assert(sameRows(Curation.packSequences(docs, 256, 8, blockBits = 2), expected))
  }

  test("packSequences conserves documents and tokens") {
    val out = Curation.packSequences(docs, 256, 8)
      .agg(sum("n_docs").as("d"), sum("n_tokens").as("t")).head()
    val totTok = docs
      .select(size(split(Portable.normText(col("text")), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(out.getLong(0) === docs.count())
    assert(out.getLong(1) === totTok)
  }

  test("packAudit rolls up the sequence manifest exactly") {
    val seqs = Curation.packSequences(docs, budget = 256, shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val audit = Curation.packAudit(docs, budget = 256, shards = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    seqs.groupBy(_._1).foreach { case (shard, ss) =>
      val (nSeqs, nDocs, nTok, fillBp, nOver, maxTok) = audit(shard)
      assert(nSeqs === ss.length.toLong)
      assert(nDocs === ss.map(_._2).sum)
      assert(nTok === ss.map(_._3).sum)
      assert(fillBp === nTok * 10000 / (nSeqs * 256))
      assert(nOver === ss.count(_._3 > 256).toLong)
      assert(maxTok === ss.map(_._3).max)
    }
    // the report must be actionable: utilization near-full on this
    // corpus (docs far smaller than the budget => little edge waste)
    assert(audit.values.forall(a => a._4 > 9000 && a._4 <= 12000))
  }

  test("curriculumSchedule: phases band by score, ordinals are a permutation") {
    val q = TextAnalysis.qualityScore(docs).select("doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Curation.curriculumSchedule(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.length === q.size)
    out.foreach { case (id, score, phase, _) =>
      assert(score === q(id))
      assert(phase === (if (score >= 75) 0 else if (score >= 50) 1 else 2))
    }
    // within each phase the ordinals are exactly 1..n (a permutation —
    // the two-level prefix sum must not skip or duplicate positions)
    out.groupBy(_._3).foreach { case (_, ms) =>
      assert(ms.map(_._4).sorted.toSeq === (1L to ms.length).toSeq)
    }
    // deterministic under reshuffling
    val again = Curation.curriculumSchedule(docs.orderBy(rand(7))).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(again === out.toSet)
  }

  test("mixtureResample matches a driver-side recount of the hash election") {
    val total = docs.count()
    val shares = Curation.DefaultShares.toMap
    val rows = docs
      .select(col("lang"), Portable.hexHash20(Portable.normText(col("text"))).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).collect {
      case (lang, xs) if shares.contains(lang) =>
        val nLang = xs.length.toLong
        val target = math.min(nLang, total * shares(lang) / 20000)
        val kept = xs.count { case (_, h) => h * nLang < 1048576L * target }
        (lang, nLang, target, kept.toLong)
    }.toSet
    val actual = Curation.mixtureResample(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(actual === expected)
  }

  test("mixtureResampleExact keeps exactly target_n, lowest by (hash, doc_id)") {
    val total = docs.count()
    val shares = Curation.DefaultShares.toMap
    val rows = docs.select(col("lang"), col("doc_id"),
        Portable.hexHash60(Portable.normText(col("text"))).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).collect {
      case (lang, xs) if shares.contains(lang) =>
        val nLang = xs.length.toLong
        val target = math.min(nLang, total * shares(lang) / 20000)
        val kept = xs.sortBy(x => (x._3, x._2)).take(target.toInt)
        (lang, nLang, target, kept.length.toLong, kept.map(_._2).sum)
    }.toSet
    val run = Curation.mixtureResampleExact(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(run === expected)
    // reshuffle-stable: a repartitioned input elects the same set
    val rerun = Curation.mixtureResampleExact(docs.repartition(7)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(rerun === expected)
  }

  test("qualityModel matches a full driver-side recount; held-out beats the majority baseline") {
    val sw = Set("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def h60(s: String): Long =
      Portable.jvmHexHash60(s.getBytes("UTF-8"))
    def norm(text: String): String =
      text.toLowerCase.replaceAll("[^a-z0-9 ]", "")
        .replaceAll(" +", " ").trim
    // independent reimplementation of the whole chain: heuristic
    // labels, hash-split stratum, hashed unigram+bigram buckets,
    // BigInt NB-difference weights, per-doc linear scores
    case class Doc(id: Long, inTrain: Long, lbl: Long, grams: Seq[Int])
    val ds = rows.map { case (id, text) =>
      val t = norm(text)
      val toks = t.split(" ", -1).toSeq
      val wc = toks.length.toLong
      val letters = t.replace(" ", "").length.toLong
      val swHits = toks.count(sw).toLong
      val alphaLen = text.toLowerCase.replaceAll("[^a-z]", "").length.toLong
      val textLen = text.length.toLong
      val score = (if (wc >= 20 && wc <= 1000) 25 else 0) +
        (if ((letters * 10) / wc >= 30 && (letters * 10) / wc <= 100) 25 else 0) +
        (if (swHits * 100 >= wc * 5) 25 else 0) +
        (if (alphaLen * 100 >= textLen * 60) 25 else 0)
      val grams = (toks ++ toks.zip(toks.tail).map { case (x, y) => s"${x}_$y" })
        .map(g => (h60(g) % 1024).toInt)
      Doc(id, if (h60(id.toString) % 100 < 50) 1L else 0L,
        if (score == 100) 1L else 0L, grams)
    }
    val S = 1000000000L
    val cp = Array.fill(1024)(0L); val cn = Array.fill(1024)(0L)
    ds.filter(_.inTrain == 1).foreach { d =>
      d.grams.foreach(g => if (d.lbl == 1) cp(g) += 1 else cn(g) += 1)
    }
    val (totP, totN) = (cp.sum, cn.sum)
    val w = Array.tabulate(1024) { g =>
      ((BigInt(cp(g)) + 1) * S / (totP + 1024) -
        (BigInt(cn(g)) + 1) * S / (totN + 1024)).toLong
    }
    val expected = ds.map { d =>
      val sc = d.grams.map(g => w(g)).sum
      (d.id, d.inTrain, d.lbl, sc, if (sc >= 0) 1L else 0L)
    }.toSet
    val trained = TextAnalysis.qualityModelTrain(docs)
    assert(trained === w.toSeq, "trained weight vector diverges from recount")
    val got = TextAnalysis.qualityModelScore(docs, trained).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    // the model must LEARN, not memorize a constant: held-out
    // agreement with the heuristic labels beats the held-out
    // majority-class baseline
    val held = ds.filter(_.inTrain == 0)
    val byId = expected.map(e => e._1 -> e._5).toMap
    val acc = held.count(d => byId(d.id) == d.lbl).toDouble / held.length
    val base = math.max(held.count(_.lbl == 1), held.count(_.lbl == 0))
      .toDouble / held.length
    info(f"held-out acc $acc%.3f vs majority baseline $base%.3f (n=${held.length})")
    assert(acc > base, f"model no better than majority: $acc%.3f <= $base%.3f")
  }

  test("modelKeeper: keeper is the max-model-score member of each cluster (tie min id)") {
    val mk = graft.operators.Dedup.modelKeeper(docs, 5000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(mk.nonEmpty)
    // exactly one keeper per cluster; it is the (score desc, id asc)
    // argmax of the cluster's members
    mk.groupBy(_._2).foreach { case (cid, members) =>
      val best = members.minBy { case (id, _, s, _, _) => (-s, id) }
      val keepers = members.filter(_._5 == 1)
      assert(keepers.map(_._1).toSeq === Seq(best._1),
        s"cluster $cid elected ${keepers.map(_._1).toSeq}, want ${best._1}")
      assert(members.forall(_._4 == best._1))
    }
    // and a multi-member cluster exists, so the election is exercised
    assert(mk.groupBy(_._2).exists(_._2.length > 1))
  }

  test("incrementalDedup: survivors are batch min-reps whose key the corpus lacks") {
    val keyed = docs.select(col("doc_id"),
      Portable.hexHash60(Portable.normText(col("text"))).as("k"),
      (Portable.hexHash20(col("doc_id").cast("string")) % 4 === 0).as("is_new"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val corpusKeys = keyed.collect { case (_, k, false) => k }.toSet
    val expected = keyed.filter(_._3).groupBy(_._2).collect {
      case (k, xs) if !corpusKeys.contains(k) =>
        (xs.map(_._1).min, xs.length.toLong)
    }.toSet
    val actual = Curation.incrementalDedup(docs, batchMod = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(actual === expected)
    assert(actual.nonEmpty)
  }

  test("bloomGuardedDedup == incrementalDedup at both filter extremes") {
    val expected = Curation.incrementalDedup(docs, batchMod = 4)
    // default bitmap: most new keys are Bloom-negative and skip the
    // corpus join entirely — the filter must introduce no false
    // negatives (a lost survivor would show up here)
    assert(sameRows(Curation.bloomGuardedDedup(docs, batchMod = 4), expected))
    // degenerate 64-bit bitmap: ~every probe collides, so ~the whole
    // batch routes through the exact anti-join — false positives must
    // only cost work, never change the result
    assert(sameRows(
      Curation.bloomGuardedDedup(docs, batchMod = 4, log2m = 6, kHashes = 2),
      expected))
  }

  test("corpusStats: shares sum to ~10000 bp and strata partition the corpus") {
    val out = Curation.corpusStats(docs).collect()
    val totalDocs = docs.count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    // integer-floor shares: each sums to (10000 - strata rounding loss)
    val docBp = out.map(_.getAs[Long]("doc_share_bp")).sum
    val tokBp = out.map(_.getAs[Long]("tok_share_bp")).sum
    assert(docBp <= 10000 && docBp > 10000 - out.length)
    assert(tokBp <= 10000 && tokBp > 10000 - out.length)
    // spot-check one stratum against a direct recount
    val r = out.head
    val n = docs.filter(col("source") === r.getAs[String]("source")
      && col("lang") === r.getAs[String]("lang")).count()
    assert(r.getAs[Long]("n_docs") === n)
  }

  test("clusterSplit: every near-dup cluster lands wholly in one split") {
    val out = Curation.clusterSplit(docs, 5000L)
    // no cluster straddles a split boundary — the property the
    // operator exists for
    assert(out.groupBy("cluster_id")
      .agg(countDistinct("split").as("n")).filter(col("n") =!= 1).isEmpty)
    // the bucket is the CLUSTER hash: recompute it independently
    val recomputed = out.select(col("doc_id"),
      (Portable.hexHash60(col("cluster_id").cast("string")) % 100).as("b2"))
    assert(out.join(recomputed, Seq("doc_id"))
      .filter(col("bucket") =!= col("b2")).isEmpty)
    // cluster partition agrees with dedupClusters
    val labels = graft.operators.Dedup.dedupClusters(docs, 5000L)
      .select("doc_id", "cluster_id")
    assert(sameRows(out.select("doc_id", "cluster_id"), labels))
    // split labels follow the 80/10/10 bucket rule
    out.collect().foreach { r =>
      val b = r.getAs[Long]("bucket")
      val want = if (b < 80) "train" else if (b < 90) "validation" else "test"
      assert(r.getAs[String]("split") === want)
    }
  }

  test("globalShuffle: two-level ordinal == one-window row_number; permutation per shard") {
    val ref = docs.select(col("doc_id"),
        Portable.hexHash60(concat(lit("shuf1:"), col("doc_id").cast("string")))
          .as("shuffle_key"))
      .withColumn("shard", pmod(col("shuffle_key"), lit(8L)))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy("shuffle_key", "doc_id"))
        .cast("long"))
    val expected = ref.select("doc_id", "shuffle_key", "shard", "pos")
    assert(sameRows(Curation.globalShuffle(docs, 8), expected))
    // blockBits changes the decomposition, never the result
    assert(sameRows(Curation.globalShuffle(docs, 8, blockBits = 2), expected))
    // pos is a dense 1..n permutation within each shard
    val bad = Curation.globalShuffle(docs, 8)
      .groupBy("shard").agg(count(lit(1)).as("n"), max("pos").as("mx"),
        countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("nd") =!= col("n"))
    assert(bad.isEmpty)
  }

  test("chunkOverlap: exact geometry and content hashes on a hand corpus") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks
      (2L, "a b c"), // shorter than one window
      (3L, (1 to 8).map(i => s"v$i").mkString(" "))) // exactly one window
      .toDF("doc_id", "text")
    def h(s: String): Long = Portable.jvmHexHash60(s.getBytes("UTF-8"))
    val toks1 = (1 to 10).map(i => s"w$i")
    val expected = Set(
      (1L, 0L, 0L, 8L, h(toks1.slice(0, 8).mkString(" "))),
      (1L, 1L, 4L, 6L, h(toks1.slice(4, 10).mkString(" "))),
      (1L, 2L, 8L, 2L, h(toks1.slice(8, 10).mkString(" "))),
      (2L, 0L, 0L, 3L, h("a b c")),
      (3L, 0L, 0L, 8L, h((1 to 8).map(i => s"v$i").mkString(" "))),
      (3L, 1L, 4L, 4L, h((5 to 8).map(i => s"v$i").mkString(" "))))
    val got = Curation.chunkOverlap(d, win = 8, stride = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    // real corpus: chunk counts and tail coverage per doc
    val byDoc = Curation.chunkOverlap(docs, win = 16, stride = 8)
      .groupBy("doc_id").agg(count(lit(1)).as("n_chunks"),
        max(col("start_tok") + col("chunk_len")).as("covered"))
    val lens = docs.select(col("doc_id"),
      size(split(Portable.normText(col("text")), " ")).cast("long").as("n_tok"))
    assert(byDoc.join(lens, Seq("doc_id"))
      .filter(col("covered") =!= col("n_tok") ||
        col("n_chunks") =!= expr("((n_tok - 1) div 8) + 1")).isEmpty)
  }

  test("ScaleStress.synth rejects factors past the 26 distinct rotations") {
    // copies i and i+26 would be verbatim duplicates: the measurement
    // would silently run a quadratic workload and call the engine slow
    val e = intercept[IllegalArgumentException] {
      ScaleStress.synth(spark, sf, tmpDir("scale-guard"), 27)
    }
    assert(e.getMessage.contains("26"))
  }

  test("repetitionSignals: exact counts on a hand-built corpus (integer-div uniq_bp)") {
    val spark0 = spark
    import spark0.implicits._
    val tiny = Seq(
      (1L, "a a b"),         // 2/3 ratio: 6666 under div, 6667 under HALF_UP
      (2L, "x x x x"),       // dup bigram "x x" occurs 3 times
      (3L, "Hello, World!")  // normalizes to "hello world"
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(tiny).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got === Array(
      (1L, 3L, 2L, 2L, 0L, 6666L),
      (2L, 4L, 1L, 4L, 3L, 2500L),
      (3L, 2L, 2L, 1L, 0L, 10000L)))
  }

  test("perplexityProxy: exact integer scores on a hand-built corpus") {
    val spark0 = spark
    import spark0.implicits._
    // corpus occurrences: a=3, b=1, c=1, total=5
    // inv: a = 5000 div 3 = 1666; b = c = 5000
    val tiny = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.perplexityProxy(tiny).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1: (1666+1666+5000) div 3 = 2777; doc2: (1666+5000) div 2 = 3333
    assert(got === Array((1L, 3L, 2777L), (2L, 2L, 3333L)))
    // rare-token-heavy text scores strictly higher than stock phrasing
    assert(got(1)._3 > got(0)._3)
  }

  test("piiRedact: per-class counts and the exact redacted text") {
    val spark0 = spark
    import spark0.implicits._
    val tiny = Seq(
      (1L, "write to bob.smith@mail-host.org today"),
      (2L, "call 555-1234 or 555-9999 from 10.0.0.1"),
      (3L, "plain text nothing to scrub"),
      (4L, "x@y.com 1.2.3.4 555-0000")
    ).toDF("doc_id", "text")
    def h(s: String) = graft.functions.Portable.jvmHexHash60(s.getBytes("UTF-8"))
    val got = TextAnalysis.piiRedact(tiny).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val expected = Array(
      (1L, 1L, 0L, 0L, "write to <EMAIL> today"),
      (2L, 0L, 2L, 1L, "call <PHONE> or <PHONE> from <IP>"),
      (3L, 0L, 0L, 0L, "plain text nothing to scrub"),
      (4L, 1L, 1L, 1L, "<EMAIL> <IP> <PHONE>")
    ).map { case (id, e, p, ip, red) =>
      (id, e, p, ip, red.length.toLong, h(red))
    }
    assert(got === expected)
  }

  test("kmeansTrain matches an independent driver-side Lloyd's") {
    val k = 4; val iters = 2
    val vecs = Ann.quantized(emb).select("vec_id", "v", "norm2").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    // pure-Scala reference: same seeding, argmin ties on centroid id,
    // floor-quantized update (Long division truncates like Spark div)
    var cents = vecs.takeWhile(_._1 < k).map { case (id, v, n2) => (id, v, n2) }
    def assign(cs: Array[(Long, Array[Long], Long)]) = vecs.map { case (id, v, n2) =>
      val best = cs.map { case (cId, cv, cn2) =>
        val dot = v.zip(cv).map { case (a, b) => a * b }.sum
        (n2 - 2 * dot + cn2, cId)
      }.min
      (id, v, best._2, best._1)
    }
    for (_ <- 1 to iters) {
      val asg = assign(cents)
      cents = asg.groupBy(_._3).toArray.sortBy(_._1).map { case (cId, xs) =>
        val n = xs.length
        val cv = Array.tabulate(64)(d => xs.map(_._2(d)).sum / n)
        (cId, cv, cv.map(x => x * x).sum)
      }
    }
    val fin = assign(cents)
    val expected = fin.groupBy(_._3).map { case (cId, xs) =>
      (cId, xs.length.toLong, xs.map(_._4).sum,
        cents.find(_._1 == cId).get._3)
    }.toSet
    val actual = Ann.kmeansTrain(emb, k = k, iterations = iters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(actual === expected)
  }

  test("kmeansProfile matches a driver-side label recount of the assignment") {
    val k = 4; val iters = 2
    val q = Ann.quantized(emb).select("vec_id", "label", "v", "norm2")
    val cents = Ann.kmeansCentroids(q, k, iters)
    // reference: per-vector argmin on the collected corpus + label rollup
    val labels = q.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = q.select("vec_id", "v", "norm2").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    val assigned = vecs.map { case (id, v, n2) =>
      val best = cents.map { case (cId, cv, cn2) =>
        (n2 - 2 * v.zip(cv).map { case (a, b) => a * b }.sum + cn2, cId)
      }.min
      (best._2, labels(id))
    }
    val expected = assigned.groupBy(_._1).map { case (cl, xs) =>
      val byLabel = xs.groupBy(_._2).map { case (l, ys) => (l, ys.length.toLong) }
      val (topL, topN) = byLabel.toSeq.sortBy { case (l, n) => (-n, l) }.head
      (cl, xs.length.toLong, topL, topN, topN * 10000 / xs.length)
    }.toSet
    val rows = Ann.kmeansProfile(emb, k = k, iterations = iters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSet === expected)
    // purity is a valid bp share and clusters partition the corpus
    assert(rows.map(_._2).sum === emb.count())
    assert(rows.forall(t => t._5 > 0 && t._5 <= 10000))
  }

  test("kmeansTrain plan depth is constant in iterations") {
    def lines(it: Int) = Ann.kmeansTrain(emb, k = 4, iterations = it)
      .queryExecution.executedPlan.toString.linesIterator.size
    assert(lines(1) === lines(3))
  }

  test("kmvDistinctTokens: exact reference, estimate formula, ALL = merge") {
    import graft.operators.Sketch
    val k = 8
    val out = Sketch.kmvDistinctTokens(docs, k).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // driver-side reference over the collected distinct (lang, h) set
    val lh = docs.select(col("lang"),
        explode(split(Portable.normText(col("text")), " ")).as("tok"))
      .select(col("lang"), Portable.hexHash60(col("tok")).as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val byLang = lh.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.toSeq).toMap
    val all = lh.map(_._2).distinct.sorted.toSeq
    def expect(hs: Seq[Long]) = {
      val kmin = hs.take(k)
      val est = if (kmin.size < k) kmin.size.toLong
        else math.round((k - 1).toDouble * math.pow(2, 60) / kmin.last.toDouble)
      (hs.size.toLong, kmin.size.toLong, kmin.last, est)
    }
    assert(out.keySet === byLang.keySet + "ALL")
    (byLang + ("ALL" -> all)).foreach { case (g, hs) =>
      assert(out(g) === expect(hs), s"group $g")
    }
    // the estimate branch (k_actual == k) is actually exercised
    assert(out.values.exists(_._2 == k.toLong))
    // mergeability: k smallest of the concatenated per-lang sketches
    // IS the corpus sketch
    val merged = byLang.values.flatMap(_.take(k)).toSeq.distinct.sorted.take(k)
    assert(merged === all.take(k))
  }

  test("cmsSketch: exact cell reference, linearity (shard merge = sum)") {
    import graft.operators.Sketch
    val sk = Sketch.cmsSketch(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // driver-side reference: replay every cell from the token stream
    val hs = docs.select(
        explode(split(Portable.normText(col("text")), " ")).as("tok"))
      .select(Portable.hexHash60(col("tok")).as("h"))
      .collect().map(_.getLong(0))
    val ref = hs.flatMap { h =>
      Sketch.cmsParams().map { case (i, a, b, d) =>
        (i, ((a * ((h / d) % 1048576L) + b) % 1048573L) % Sketch.CmsWidth)
      }
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(sk === ref)
    // every row of a CMS sums to the stream length
    (0 until Sketch.CmsDepth).foreach { i =>
      assert(sk.collect { case ((r, _), c) if r == i => c }.sum
        === hs.length.toLong, s"row $i")
    }
    // LINEARITY — the mergeable-summary property the 100 TB story
    // rests on: the sketch of the union is the element-wise sum of
    // per-shard sketches
    val lo = Sketch.cmsSketch(docs.filter(col("doc_id") % 2 === 0)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hi = Sketch.cmsSketch(docs.filter(col("doc_id") % 2 === 1)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val summed = (lo.keySet ++ hi.keySet).map(k =>
      k -> (lo.getOrElse(k, 0L) + hi.getOrElse(k, 0L))).toMap
    assert(summed === sk)
  }

  test("heavyHittersCms: never under-estimates, no true heavy hitter missed") {
    import graft.operators.Sketch
    val bp = 100L
    val out = Sketch.heavyHittersCms(docs, bp).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)
    // exact reference counts
    val exact = docs.select(
        explode(split(Portable.normText(col("text")), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    // CMS over-estimate guarantee: est >= exact, overcount consistent
    out.foreach { case (tok, (nExact, est, over)) =>
      assert(nExact === exact(tok), tok)
      assert(est >= nExact, tok)
      assert(over === est - nExact, tok)
      assert(est * 10000L >= n * bp, tok) // threshold actually applied
    }
    // NO FALSE NEGATIVES: every token with true share >= threshold is
    // in the output (est >= exact makes this structural, not sampled)
    exact.foreach { case (tok, c) =>
      if (c * 10000L >= n * bp) assert(out.contains(tok), s"missed $tok")
    }
  }

  test("estimateCms: pure-sketch serving agrees with the audit path; no exact pass") {
    import graft.operators.Sketch
    val cands = graft.functions.TextAnalysis
      .tokens(docs.filter(col("doc_id") % 100 === 3)).select("tok")
    val out = Sketch.estimateCms(docs, cands).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.nonEmpty)
    // exact reference: the serving estimate must carry CMS's one-sided
    // guarantee (est >= exact) and the exact share arithmetic
    val exact = docs.select(
        explode(split(Portable.normText(col("text")), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    out.foreach { case (tok, (est, shareBp)) =>
      assert(est >= exact(tok), tok)
      assert(shareBp === est * 10000L / n, tok)
    }
    // candidates == the stratum's distinct vocabulary, exactly once
    val want = docs.filter(col("doc_id") % 100 === 3).select(
        explode(split(Portable.normText(col("text")), " ")).as("tok"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(out.keySet === want)
    // the serving estimate equals the audit path's estimate for every
    // candidate the audit row kept (same sketch, same min-over-rows)
    val audit = Sketch.heavyHittersCms(docs, 1L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    out.foreach { case (tok, (est, _)) =>
      audit.get(tok).foreach(a => assert(a === est, tok))
    }
    // the serving plan has no exact token aggregation: one sketch
    // build (collected) + a projection — the candidate side's only
    // aggregate is its distinct
    val plan = Sketch.estimateCms(docs, cands)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("count(1)"), plan.take(2000))
  }

  test("curationAudit: fates partition the corpus; kept set == curatedCorpus") {
    import graft.operators.Pipelines
    val bench = col("doc_id") % 50 === 0
    val audit = Pipelines.curationAudit(docs, minQuality = 75,
        langs = Seq("en"), minJaccardBp = 5000L, isBenchmark = bench)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exactly one fate per doc — counts partition the corpus, and the
    // id sums partition the id mass (content, not just cardinality)
    assert(audit.values.map(_._1).sum === docs.count())
    val ids = docs.select(sum("doc_id")).head.getLong(0)
    assert(audit.values.map(_._2).sum === ids)
    // the kept_* rows reproduce the pipeline's survivor set
    val kept = Pipelines.curatedCorpus(docs, minQuality = 75,
        langs = Seq("en"), minJaccardBp = 5000L, isBenchmark = bench)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.nonEmpty)
    Seq("train", "validation", "test").foreach { s =>
      val ks = kept.filter(_._2 == s).map(_._1)
      val (n, idSum) = audit.getOrElse(s"kept_$s", (0L, 0L))
      assert(n === ks.length.toLong, s"kept_$s count")
      assert(idSum === ks.sum, s"kept_$s id_sum")
    }
  }
}
