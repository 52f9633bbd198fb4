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

  test("ingest with autoCompactMaxFiles keeps the key log bounded, results identical") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-curation-auto")
    val idx = FsKeyIndex(spark, s"$root/index")
    val input = MemoryStream[(Long, String)]
    val bound = 6
    val q = StreamingCuration.dedupIngest(
      input.toDS().toDF("doc_id", "text"), idx,
      s"$root/corpus", s"$root/ckpt",
      autoCompactMaxFiles = Some(bound))
    try {
      (0 until 8).foreach { b =>
        // each batch: one fresh doc + one duplicate of batch 0's doc
        input.addData((100L + b) -> s"fresh text $b", (200L + b) -> "dup me")
        q.processAllAvailable()
        assert(idx.logFileCount() <= bound,
          s"batch $b: ${idx.logFileCount()} log files")
      }
    } finally q.stop()
    // dedup semantics untouched by the maintenance cadence: the dup
    // text ingested once (batch 0's rep), every fresh doc kept
    val docs = corpus(s"$root/corpus").map(_._1)
    assert((0 until 8).forall(b => docs.contains(100L + b)))
    assert(docs.count(_ >= 200L) === 1)
    assert(FsKeyIndex(spark, s"$root/index").keys().count() === 9)
  }

  test("near-dup ingest: band collisions drop across batches; floor docs pass") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-neardup")
    val idx = FsKeyIndex(spark, s"$root/bands")
    // long repeated base so shingle overlap (and hence band collision
    // probability) is high for the appended-tail variant
    val base = ("the quick brown fox jumps over the lazy dog and then " +
      "runs across the wide green field toward the old stone bridge ") * 2
    val variant = base + "with a few extra tail words appended"
    val other = ("completely different text about ships and long voyages " +
      "across the cold northern sea under a pale winter sun ") * 2
    def ids(dir: String): Set[Long] =
      spark.read.parquet(dir).select("doc_id").collect()
        .map(_.getLong(0)).toSet
    val input = MemoryStream[(Long, String)]
    val q = StreamingCuration.nearDupIngest(
      input.toDS().toDF("doc_id", "text"), idx,
      s"$root/corpus", s"$root/ckpt")
    try {
      // batch 0: 3 is an exact dup of 1 (all four bands equal —
      // deterministic drop); 4 is below the shingle floor
      input.addData(1L -> base, 2L -> other, 3L -> base, 4L -> "hi")
      q.processAllAvailable()
      assert(ids(s"$root/corpus") === Set(1L, 2L, 4L))
      // batch 1: the variant shares ≥1 band with ingested doc 1 (high
      // Jaccard; pinned by the fixed hash family) → dropped; a floor
      // doc repeats and passes again (below the similarity floor, by
      // contract); 11 is novel
      input.addData(10L -> variant, 11L -> "a brand new story entirely",
        12L -> "hi")
      q.processAllAvailable()
      assert(ids(s"$root/corpus") === Set(1L, 2L, 4L, 11L, 12L))
    } finally q.stop()
    // a fresh lineage over the SHARED band index still sees batch 0/1:
    // exact re-sends collide on every band
    val input2 = MemoryStream[(Long, String)]
    val q2 = StreamingCuration.nearDupIngest(
      input2.toDS().toDF("doc_id", "text"), FsKeyIndex(spark, s"$root/bands"),
      s"$root/corpus2", s"$root/ckpt2")
    try {
      input2.addData(20L -> other, 21L -> ("an unrelated final tale told " +
        "around the evening fire in the mountain village for hours"))
      q2.processAllAvailable()
      assert(ids(s"$root/corpus2") === Set(21L))
    } finally q2.stop()
  }

  test("near-dup replay AFTER the index add keeps the corpus whole") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-neardup-replay")
    val base = ("the quick brown fox jumps over the lazy dog and then " +
      "runs across the wide green field toward the old stone bridge ") * 2
    def ids(dir: String): Set[Long] =
      spark.read.parquet(dir).select("doc_id").collect()
        .map(_.getLong(0)).toSet
    val input = MemoryStream[(Long, String)]
    val q = StreamingCuration.nearDupIngest(
      input.toDS().toDF("doc_id", "text"), FsKeyIndex(spark, s"$root/bands"),
      s"$root/corpus", s"$root/ckpt")
    try {
      input.addData(1L -> base, 4L -> "hi")
      q.processAllAvailable()
      assert(ids(s"$root/corpus") === Set(1L, 4L))
    } finally q.stop()
    // crash-replay on the WRONG side of the index add: a fresh
    // checkpoint re-delivers the same data as its own batch 0 while
    // the index already holds doc 1's bands. Re-election alone would
    // drop doc 1 — and the floor doc makes the replayed write
    // NON-empty, so without the existing-partition union the
    // partition overwrite would shrink to {4}.
    val input2 = MemoryStream[(Long, String)]
    val q2 = StreamingCuration.nearDupIngest(
      input2.toDS().toDF("doc_id", "text"), FsKeyIndex(spark, s"$root/bands"),
      s"$root/corpus", s"$root/ckpt-replayed")
    try {
      input2.addData(1L -> base, 4L -> "hi")
      q2.processAllAvailable()
    } finally q2.stop()
    assert(ids(s"$root/corpus") === Set(1L, 4L))
  }

  test("verify mode: band false positive survives, fast mode drops it, true dup drops, replay holds") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val root = tmpDir("st-neardup-verify")
    val base = ("the quick brown fox jumps over the lazy dog and then " +
      "runs across the wide green field toward the old stone bridge ") * 2
    // find an S-curve FALSE POSITIVE deterministically under the fixed
    // hash family: a doc of LOW estimated Jaccard vs `base` that still
    // shares ≥1 band at the 4×2 geometry
    val fillers = Array("river", "stone", "cloud", "ember", "frost",
      "maple", "raven", "slate", "tidal", "wharf")
    val variants = (0 until 120).map { i =>
      val tail = (0 until 14)
        .map(j => fillers((i + j * 3) % 10) + i + j).mkString(" ")
      (100L + i) -> (base.split(' ').take(10).mkString(" ") + " " + tail)
    }
    val probe = ((1L -> base) +: variants).toDF("doc_id", "text")
    val sh = Dedup.shingleTable(probe)
      .select(col("doc_id"), graft.functions.Portable.hexHash60(col("s")).as("h"))
    val sigs = Dedup.minhashSignatures(sh, 8)
    val banded = Dedup.bandedSignatures(sigs, 4, 2)
      .select(col("doc_id"),
        concat_ws(":", col("band"), col("band_key")).as("bk"))
    val baseBands = banded.filter(col("doc_id") === 1L).select("bk")
    val colliders = banded.join(baseBands, Seq("bk"))
      .filter(col("doc_id") =!= 1L)
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted
    val sigMap = sigs.collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    def est(a: Long, b: Long): Long =
      sigMap(a).zip(sigMap(b)).count { case (x, y) => x == y } * 10000L / 8
    val fpOpt = colliders.find(v => est(1L, v) < 5000)
    assert(fpOpt.nonEmpty, "no low-similarity band collision in the probe family")
    val fp = fpOpt.get
    val fpText = variants.find(_._1 == fp).get._2
    def ids(dir: String): Set[Long] =
      spark.read.parquet(dir).select("doc_id").collect()
        .map(_.getLong(0)).toSet

    // FAST mode: the collision alone drops the false positive
    val inF = MemoryStream[(Long, String)]
    val qF = StreamingCuration.nearDupIngest(
      inF.toDS().toDF("doc_id", "text"), FsKeyIndex(spark, s"$root/fast/bands"),
      s"$root/fast/corpus", s"$root/fast/ckpt", bands = 4, rows = 2)
    try {
      inF.addData(1L -> base, 4L -> "hi")
      qF.processAllAvailable()
      inF.addData(fp -> fpText)
      qF.processAllAvailable()
      assert(ids(s"$root/fast/corpus") === Set(1L, 4L)) // fp lost
    } finally qF.stop()

    // VERIFY mode: the stored-signature estimate clears the false
    // positive (est < threshold) and still drops a true duplicate
    val inV = MemoryStream[(Long, String)]
    val qV = StreamingCuration.nearDupIngest(
      inV.toDS().toDF("doc_id", "text"), FsKeyIndex(spark, s"$root/ver/bands"),
      s"$root/ver/corpus", s"$root/ver/ckpt", bands = 4, rows = 2,
      verifyMinJaccardBp = Some(5000L))
    try {
      inV.addData(1L -> base, 4L -> "hi")
      qV.processAllAvailable()
      inV.addData(fp -> fpText)
      qV.processAllAvailable()
      assert(ids(s"$root/ver/corpus") === Set(1L, 4L, fp)) // fp SURVIVES
      inV.addData(999L -> base) // exact dup: est = 10000 ≥ threshold
      qV.processAllAvailable()
      assert(ids(s"$root/ver/corpus") === Set(1L, 4L, fp))
    } finally qV.stop()

    // replay fixpoint in verify mode: a fresh checkpoint re-delivers
    // batch 0 while bandstore/sigstore already hold its rows — the
    // self-match exclusion + existing-partition union keep the corpus
    // whole and the sidecar rewrite identical
    val inR = MemoryStream[(Long, String)]
    val qR = StreamingCuration.nearDupIngest(
      inR.toDS().toDF("doc_id", "text"), FsKeyIndex(spark, s"$root/ver/bands"),
      s"$root/ver/corpus", s"$root/ver/ckpt-replayed", bands = 4, rows = 2,
      verifyMinJaccardBp = Some(5000L))
    try {
      inR.addData(1L -> base, 4L -> "hi")
      qR.processAllAvailable()
    } finally qR.stop()
    assert(ids(s"$root/ver/corpus") === Set(1L, 4L, fp))
    // no duplicate sidecar rows after the replay
    val sigRows = spark.read.parquet(s"$root/ver/bands/sigstore")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(sigRows.size === sigRows.distinct.size)
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

  test("near-dup index geometry is versioned: mismatched probe refuses") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-neardup-geom")
    val idx = FsKeyIndex(spark, s"$root/bands")
    // first lineage stamps the manifest with the 16x8 default
    val input = MemoryStream[(Long, String)]
    val q = StreamingCuration.nearDupIngest(
      input.toDS().toDF("doc_id", "text"), idx,
      s"$root/corpus", s"$root/ckpt")
    try {
      input.addData(1L -> ("a long enough document to band " * 4))
      q.processAllAvailable()
    } finally q.stop()
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/bands/geometry")).trim
      === "bands=16 rows=8")
    // a later lineage under the legacy 4x2 geometry must refuse BEFORE
    // any batch runs - its band keys would never collide with the
    // index's and every duplicate would silently pass
    val input2 = MemoryStream[(Long, String)]
    val e = intercept[IllegalStateException] {
      StreamingCuration.nearDupIngest(
        input2.toDS().toDF("doc_id", "text"), FsKeyIndex(spark, s"$root/bands"),
        s"$root/corpus2", s"$root/ckpt2", bands = 4, rows = 2)
    }
    assert(e.getMessage.contains("bands=16 rows=8"))
    // matching geometry (even explicit) still probes fine
    val input3 = MemoryStream[(Long, String)]
    val q3 = StreamingCuration.nearDupIngest(
      input3.toDS().toDF("doc_id", "text"), FsKeyIndex(spark, s"$root/bands"),
      s"$root/corpus3", s"$root/ckpt3", bands = 16, rows = 8)
    q3.stop()
  }

  test("near-dup audit measures the S-curve misses the ingest admits") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-neardup-audit")
    val idx = FsKeyIndex(spark, s"$root/bands")
    val base = ("alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu ") * 4
    // last third of the tokens changed: the mid-similarity region
    // where the 16x8 S-curve usually does NOT collide (admits the doc)
    // while the verified batch pipeline still finds the pair at a low
    // threshold
    val variant = ("alpha beta gamma delta epsilon zeta eta theta " +
      "omega psi chi rho ") * 4
    // the audit's df cap is corpus-relative (df·20 ≤ n_docs): pad the
    // corpus with unrelated filler docs so the base/variant shared
    // shingles (df = 2) survive the cap, as they would in any real
    // corpus
    val filler = (10L until 70L).map(i =>
      i -> (s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h " * 6))
    val input = MemoryStream[(Long, String)]
    val q = StreamingCuration.nearDupIngest(
      input.toDS().toDF("doc_id", "text"), idx, s"$root/corpus",
      s"$root/ckpt")
    try {
      input.addData(1L -> base)
      input.addData(filler: _*)
      q.processAllAvailable()
      // exact copy drops (every bucket collides); the variant is
      // admitted (its banded signature misses doc 1's buckets)
      input.addData(2L -> base, 3L -> variant)
      q.processAllAvailable()
    } finally q.stop()
    val keptDocs = spark.read.parquet(s"$root/corpus")
      .select("doc_id", "text")
    val kept = keptDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === (Set(1L, 3L) ++ filler.map(_._1)),
      s"expected the exact copy dropped and the variant admitted: $kept")
    val nKept = kept.size.toLong
    val audit = StreamingCuration.nearDupAudit(
      spark, s"$root/corpus", 2000L).collect()
    assert(audit.length === 1)
    val a = audit.head
    // the audit IS the verified batch pipeline (at the high-recall
    // 64x2 candidate geometry) over the kept corpus: its counts must
    // equal a direct run
    val direct = graft.operators.Dedup.minhashLsh(keptDocs, 2000L, 64, 2)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.getAs[Long]("n_docs") === nKept)
    assert(a.getAs[Long]("residual_pairs") === direct.size.toLong)
    // the admitted variant is a real verified near-dup of doc 1 (true
    // shingle Jaccard ≈ 0.44): the residue the over-drop design is
    // documented to admit, invisible to a 16x8 re-run (the same
    // S-curve that missed it at ingest — the reason the audit runs
    // narrow bands) and surfaced here
    assert(graft.operators.Dedup.minhashLsh(keptDocs, 2000L, 16, 8)
      .count() === 0L, "16x8 would have been blind to the miss")
    assert(direct.contains((1L, 3L)), direct.toString)
    assert(a.getAs[Long]("docs_in_pairs") === 2L)
    assert(a.getAs[Long]("residual_bp") === 2L * 10000 / nKept)
    assert(a.getAs[Long]("n_shingles") > 0L)
    // the blind-spot SIGNAL: on a corpus small enough that the
    // corpus-relative df cap empties the shingle universe, the report
    // says so (n_shingles = 0) instead of posing as a clean bill
    val tiny = s"$root/tiny"
    spark.createDataFrame(Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta")))
      .toDF("doc_id", "text")
      .withColumn("ingest_batch", org.apache.spark.sql.functions.lit(0L))
      .write.partitionBy("ingest_batch").parquet(tiny)
    val blind = StreamingCuration.nearDupAudit(spark, tiny, 2000L)
      .collect().head
    assert(blind.getAs[Long]("n_docs") === 2L)
    assert(blind.getAs[Long]("n_shingles") === 0L,
      "expected the emptied-universe signal on a sub-cap corpus")
    assert(blind.getAs[Long]("residual_pairs") === 0L)
  }

  test("legacy manifest-less index is never auto-stamped; explicit stamp works") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-neardup-legacy")
    // fabricate a pre-manifest legacy index: a key log with NO
    // geometry file (what a pre-versioning lineage left behind)
    val idx = FsKeyIndex(spark, s"$root/bands")
    idx.add(Seq(42L, 43L).toDF("k"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/bands/geometry"))
    // a default-parameter ingest would stamp 16x8 and probe legacy
    // 4x2-derived keys with 16x8 keys — zero collisions, every
    // duplicate admitted: it must REFUSE instead
    val input = MemoryStream[(Long, String)]
    val e = intercept[IllegalStateException] {
      StreamingCuration.nearDupIngest(
        input.toDS().toDF("doc_id", "text"),
        FsKeyIndex(spark, s"$root/bands"), s"$root/corpus", s"$root/ckpt")
    }
    assert(e.getMessage.contains("stampGeometry"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/bands/geometry")),
      "the refused call must not have stamped anything")
    // the operator's remedy: one explicit stamp with the geometry the
    // index was BUILT with, after which that geometry probes fine
    StreamingCuration.stampGeometry(s"$root/bands", 4, 2)
    StreamingCuration.stampGeometry(s"$root/bands", 4, 2) // idempotent
    val e2 = intercept[IllegalStateException] {
      StreamingCuration.stampGeometry(s"$root/bands", 16, 8)
    }
    assert(e2.getMessage.contains("bands=4 rows=2"))
    val input2 = MemoryStream[(Long, String)]
    val q2 = StreamingCuration.nearDupIngest(
      input2.toDS().toDF("doc_id", "text"),
      FsKeyIndex(spark, s"$root/bands"), s"$root/corpus", s"$root/ckpt",
      bands = 4, rows = 2)
    try {
      input2.addData(5L -> ("a long enough document to band " * 4))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(s"$root/corpus").count() === 1L)
    // a genuinely FRESH index (no key log) still auto-stamps its
    // caller's geometry — only legacy data blocks the default path
    val input3 = MemoryStream[(Long, String)]
    val q3 = StreamingCuration.nearDupIngest(
      input3.toDS().toDF("doc_id", "text"),
      FsKeyIndex(spark, s"$root/fresh"), s"$root/corpusF", s"$root/ckptF")
    q3.stop()
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/fresh/geometry")).trim
      === "bands=16 rows=8")
  }
}
