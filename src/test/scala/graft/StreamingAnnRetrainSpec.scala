package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Ann
import graft.streaming.StreamingAnn

/** ST7/ST8 model generations: the coarse-quantizer drift path
  * (retrainIndex) — parity with the batch operators on the retrained
  * model, recall restoration under a drifted frozen model, atomic
  * crash-safe cutover, and generation vacuum.
  */
class StreamingAnnRetrainSpec extends SparkSuite {

  private def embRows: Array[(Long, Seq[Float])] = {
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
    e.map(r => (r.getLong(0), r.getSeq[Float](1)))
  }

  private def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  test("retrain parity: post-retrain queries equal knnIvfTrained on the retrained model") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-ann-retrain-parity")
    val rows = embRows
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val queries = rows.filter(_._1 < 5).toSeq.toDF("vec_id", "embedding")
    // frozen model trains on a 30-vector first batch — NOT the corpus
    // the batch operator trains on, so pre-retrain parity cannot hold
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnn.ivfIngest(
      input.toDS().toDF("vec_id", "embedding"),
      s"$root/model.txt", s"$root/index", s"$root/ckpt",
      kCells = 8, iterations = 2)
    try {
      input.addData(rows.filter(_._1 < 30).toSeq: _*)
      q.processAllAvailable()
      input.addData(rows.filter(_._1 >= 30).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    // retrain on the full visible corpus with the batch geometry
    val gen = StreamingAnn.retrainIndex(spark, s"$root/index",
      kCells = 8, iterations = 2)
    assert(gen === 1L)
    // the retrained generation serves through the ORIGINAL modelPath
    // argument (gen-local model takes precedence) and must equal the
    // batch operator trained on the same corpus at equal geometry
    val got = snap(StreamingAnn.queryIndex(spark, s"$root/index",
      s"$root/model.txt", queries, k = 3, probes = 2))
    val want = snap(Ann.knnIvfTrained(emb, numQueries = 5, k = 3,
      kCells = 8, iterations = 2, probes = 2))
    assert(got === want)
    // post-retrain ingest continues into the new generation: a fresh
    // delivery is visible without any restart bookkeeping
    val extra = rows.take(10).map { case (id, e) => (id + 90000L, e) }
    val input2 = MemoryStream[(Long, Seq[Float])]
    val q2 = StreamingAnn.ivfIngest(
      input2.toDS().toDF("vec_id", "embedding"),
      s"$root/model.txt", s"$root/index", s"$root/ckpt-post")
    try { input2.addData(extra.toSeq: _*); q2.processAllAvailable() }
    finally q2.stop()
    val genRoot = StreamingAnn.resolveRoot(s"$root/index")
    assert(genRoot.endsWith("_gen-1"))
    assert(StreamingAnn.listLeaves(genRoot).exists(_._2 >= 0L),
      "post-retrain delivery did not land in the new generation")
    // the fresh rows are byte copies of vecs 0-9: querying the
    // ORIGINALS must return their fresh twins at cos 1.0 — proof the
    // new generation serves the post-retrain delivery
    val fq = StreamingAnn.queryIndex(spark, s"$root/index",
      s"$root/model.txt", rows.take(2).toSeq.toDF("vec_id", "embedding"),
      k = 5, probes = 8).collect()
    val twins = fq.filter(r => r.getLong(2) >= 90000L)
    assert(twins.nonEmpty, "fresh twins not served")
    assert(twins.forall(_.getLong(3) === 10000L),
      "a fresh twin did not score cos 1.0 against its original")
  }

  test("drift: retraining restores the scan bound (and recall-per-row) a stale model abandoned") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-ann-retrain-drift")
    val rows = embRows
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val nq = 20
    val k = 10
    // ground truth over the full corpus
    val truth = Ann.knnBruteForce(emb, numQueries = nq, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val queries = rows.filter(_._1 < nq).toSeq.toDF("vec_id", "embedding")
    def recallOf(res: Array[org.apache.spark.sql.Row]): Double = {
      val got = res.map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .map { case (q, xs) => q -> xs.map(_._2).toSet }
      val hits = truth.map { case (q, t) =>
        (t intersect got.getOrElse(q, Set.empty)).size }.sum
      hits.toDouble / truth.values.map(_.size).sum
    }
    // drift fixture: the frozen model trains on the 24 vectors MOST
    // similar to vec 0 — one narrow cone. Its 8 centroids are
    // near-parallel, so assigning the REST of the corpus (which the
    // model never saw) is decided by noise-level cosine margins:
    // true neighbors scatter near-arbitrarily across cells and the
    // probe-1 scan bound collapses recall toward 1/kCells. This is
    // exactly what corpus drift does to a frozen coarse quantizer.
    def cosTo0(v: Seq[Float]): Double = {
      val a = rows(0)._2
      val dot = a.zip(v).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(v.map(x => x.toDouble * x).sum))
    }
    val coneIds = rows.sortBy(r => -cosTo0(r._2)).take(24).map(_._1).toSet
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnn.ivfIngest(
      input.toDS().toDF("vec_id", "embedding"),
      s"$root/model.txt", s"$root/index", s"$root/ckpt",
      kCells = 8, iterations = 2)
    try {
      input.addData(rows.filter(r => coneIds.contains(r._1)).toSeq: _*)
      q.processAllAvailable()
      input.addData(rows.filterNot(r => coneIds.contains(r._1)).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    def maxShareBp(): Long = StreamingAnn.indexStats(spark, s"$root/index")
      .agg(max(col("share_bp"))).head().getLong(0)
    val staleShare = maxShareBp()
    val stale = recallOf(StreamingAnn.queryIndex(spark, s"$root/index",
      s"$root/model.txt", queries, k = k, probes = 1).collect())
    // the drifted model has ABANDONED the scan bound: one cell holds
    // most of the corpus, so its probe-1 recall — however high — is a
    // near-full scan in disguise (in-corpus queries always probe
    // their own giant cell). On this isotropic corpus that is the
    // form drift harm takes; a corpus with real cluster structure
    // would additionally lose raw recall.
    assert(staleShare >= 5000L,
      s"fixture failed to degenerate the stale model (max share $staleShare bp)")
    StreamingAnn.retrainIndex(spark, s"$root/index", kCells = 8, iterations = 2)
    val newShare = maxShareBp()
    val retrained = recallOf(StreamingAnn.queryIndex(spark, s"$root/index",
      s"$root/model.txt", queries, k = k, probes = 1).collect())
    info(f"recall@$k probes=1: stale=$stale%.3f @ share ${staleShare}bp, " +
      f"retrained=$retrained%.3f @ share ${newShare}bp")
    // retrain restores the 1/kCells scan bound...
    assert(newShare <= 3000L,
      s"retrain did not restore the scan bound (max share $newShare bp)")
    // ...at the trained model's probe-1 recall level...
    assert(retrained >= 0.45,
      f"retrained probe-1 recall collapsed: $retrained%.3f")
    // ...so recall per scanned row (the metric the probe budget buys)
    // measurably improves — the restoration drift had destroyed
    assert(retrained / newShare > 1.5 * stale / staleShare,
      f"no efficiency restoration: stale $stale%.3f/${staleShare}bp vs " +
        f"retrained $retrained%.3f/${newShare}bp")
  }

  test("retrainIfNeeded: the share signal drives the drift cadence") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-ann-retrain-cadence")
    val rows = embRows
    // cone-degenerate frozen model, as the drift spec
    def cosTo0(v: Seq[Float]): Double = {
      val a = rows(0)._2
      a.zip(v).map { case (x, y) => x.toDouble * y.toDouble }.sum /
        (math.sqrt(a.map(x => x.toDouble * x).sum) *
          math.sqrt(v.map(x => x.toDouble * x).sum))
    }
    val coneIds = rows.sortBy(r => -cosTo0(r._2)).take(24).map(_._1).toSet
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnn.ivfIngest(
      input.toDS().toDF("vec_id", "embedding"),
      s"$root/model.txt", s"$root/index", s"$root/ckpt",
      kCells = 8, iterations = 2)
    try {
      input.addData(rows.filter(r => coneIds.contains(r._1)).toSeq: _*)
      q.processAllAvailable()
      input.addData(rows.filterNot(r => coneIds.contains(r._1)).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    // degenerate share trips the bound -> retrain runs once
    val gen = StreamingAnn.retrainIfNeeded(spark, s"$root/index",
      maxShareBp = 2500, kCells = 8, iterations = 2)
    assert(gen === Some(1L))
    // the restored share sits under the bound -> the next check no-ops
    assert(StreamingAnn.retrainIfNeeded(spark, s"$root/index",
      maxShareBp = 2500, kCells = 8, iterations = 2).isEmpty)
    assert(StreamingAnn.readCurrentGen(s"$root/index") === Some(1L))
  }

  test("crash seams: an unflipped generation never serves; re-run converges; vacuum reclaims") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("st-ann-retrain-crash")
    val rows = embRows
    val queries = rows.filter(_._1 < 5).toSeq.toDF("vec_id", "embedding")
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnn.ivfIngest(
      input.toDS().toDF("vec_id", "embedding"),
      s"$root/model.txt", s"$root/index", s"$root/ckpt")
    try { input.addData(rows.take(60).toSeq: _*); q.processAllAvailable() }
    finally q.stop()
    val before = snap(StreamingAnn.queryIndex(spark, s"$root/index",
      s"$root/model.txt", queries, k = 3, probes = 8))
    // crash after the data write (no stamp, no model, no flip)
    StreamingAnn.retrainIndexImpl(spark, s"$root/index",
      kCells = 4, iterations = 1, crashPoint = 1)
    assert(StreamingAnn.readCurrentGen(s"$root/index").isEmpty)
    assert(snap(StreamingAnn.queryIndex(spark, s"$root/index",
      s"$root/model.txt", queries, k = 3, probes = 8)) === before,
      "a crashed (unflipped) retrain changed query results")
    // crash after stamp+model (complete but unreferenced generation)
    StreamingAnn.retrainIndexImpl(spark, s"$root/index",
      kCells = 4, iterations = 1, crashPoint = 2)
    assert(StreamingAnn.readCurrentGen(s"$root/index").isEmpty)
    assert(snap(StreamingAnn.queryIndex(spark, s"$root/index",
      s"$root/model.txt", queries, k = 3, probes = 8)) === before)
    // the re-run converges: deletes the partial build, commits gen-1
    val gen = StreamingAnn.retrainIndex(spark, s"$root/index",
      kCells = 4, iterations = 1)
    assert(gen === 1L)
    assert(StreamingAnn.readCurrentGen(s"$root/index") === Some(1L))
    val after = snap(StreamingAnn.queryIndex(spark, s"$root/index",
      s"$root/model.txt", queries, k = 3, probes = 4))
    assert(after.nonEmpty)
    // cutover deleted nothing: the flat generation's leaves are intact
    assert(StreamingAnn.listLeaves(s"$root/index").nonEmpty,
      "cutover deleted the old generation's leaves")
    // a second retrain chains generations
    val gen2 = StreamingAnn.retrainIndex(spark, s"$root/index",
      kCells = 4, iterations = 1)
    assert(gen2 === 2L)
    assert(StreamingAnn.resolveRoot(s"$root/index").endsWith("gen-2"))
    // vacuumGenerations reclaims the flat gen-0 remnants and gen-1,
    // keeps gen-2 serving
    assert(StreamingAnn.vacuumGenerations(s"$root/index") > 0)
    assert(StreamingAnn.listLeaves(s"$root/index").isEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/index/_gen-1")))
    assert(snap(StreamingAnn.queryIndex(spark, s"$root/index",
      s"$root/model.txt", queries, k = 3, probes = 4)).nonEmpty)
  }
}
