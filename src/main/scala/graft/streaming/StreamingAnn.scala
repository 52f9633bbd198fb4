package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.VecOps
import graft.operators.Ann

/** ST7: continuous IVF index maintenance — the streaming form of the
  * A3/A5 vector-index pipeline (a production vector store is
  * INCREMENTAL: embeddings arrive with the corpus, the index must
  * absorb them without retraining or rebuilding).
  *
  * Design, mirroring how production systems (FAISS-style serving
  * stacks) split the problem:
  *  - **Train once, ship the model**: the coarse quantizer is trained
  *    on the FIRST batch (deterministic Lloyd's — the engine's
  *    bit-reproducible training loop) and persisted as a driver-scale
  *    model artifact; every later batch and every query uses the
  *    FROZEN model, so cell assignment never drifts and the index
  *    never needs a global rebuild. (Production would train on a
  *    dedicated sample; the contract is identical.)
  *  - **Per-batch assignment is a zero-shuffle projection**: the
  *    argmin over driver-held centroid literals ([[Ann.kmeansAssign]])
  *    — no join, no corpus shuffle, cost linear in the batch.
  *  - **The index is a cell-partitioned table**: rows land in
  *    `cell=<c>/ingest_batch=<b>` parquet partitions. Queries touch
  *    ONLY their probed cells via partition pruning — the IVF scan
  *    bound holds on disk layout, not just in the plan.
  *  - **Exactly-once under replay**: dynamic partition overwrite of
  *    the batch's own `(cell, ingest_batch)` leaves + deterministic
  *    assignment under the frozen model ⇒ a replayed batch rewrites
  *    its partitions bit-identically (same discipline as
  *    [[StreamingCuration.dedupIngest]]).
  */
object StreamingAnn {

  /** Persist a trained centroid set as a text artifact (one line per
    * centroid: `c_id|comp,comp,...|norm2`), written atomically via
    * temp-file rename so a crash mid-save never leaves a torn model
    * for a replayed batch to load.
    */
  def saveModel(path: String, cent: Seq[(Long, Seq[Long], Long)]): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    val body = cent.map { case (c, v, n2) =>
      s"$c|${v.mkString(",")}|$n2"
    }.mkString("\n")
    java.nio.file.Files.writeString(tmp, body)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def loadModel(path: String): Option[Seq[(Long, Seq[Long], Long)]] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) None
    else Some(java.nio.file.Files.readString(p).split("\n").toSeq.map { l =>
      val Array(c, v, n2) = l.split("\\|")
      (c.toLong, v.split(",").toSeq.map(_.toLong), n2.toLong)
    })
  }

  /** Milli-quantized (vec_id, v, norm2) projection of an embedding
    * frame (label-free twin of [[Ann.quantized]] — streaming batches
    * need not carry a label column).
    */
  private def quantize(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        transform(col("embedding"), x => round(x * 1000, 0).cast("long")).as("v"))
      .withColumn("norm2", VecOps.intDot(col("v"), col("v")))

  /** Start the index ingest: `emb` is a streaming frame with at least
    * (vec_id: long, embedding: array<float>). The first batch trains
    * and persists the model at `modelPath` (skipped if one already
    * exists — a pre-trained model is honored); every batch assigns
    * against the frozen model and appends to the cell-partitioned
    * index at `indexDir`.
    *
    * Contract: like the curation ingests, `indexDir` is owned by one
    * checkpoint lineage (batch ids key the idempotent partitions);
    * the model artifact is durable across lineages.
    */
  def ivfIngest(emb: DataFrame, modelPath: String, indexDir: String,
      checkpointDir: String, kCells: Int = 8,
      iterations: Int = 2): StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val qb = quantize(batch)
        val cent = loadModel(modelPath).getOrElse {
          val c = Ann.kmeansCentroidsUncached(
            qb.select("vec_id", "v", "norm2"), kCells, iterations)
          saveModel(modelPath, c)
          c
        }
        Ann.kmeansAssign(qb, cent)
          .select(col("vec_id"), col("v"), col("norm2"),
            col("cluster").as("cell"))
          .withColumn("ingest_batch", lit(batchId))
          .write
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .partitionBy("cell", "ingest_batch")
          .parquet(indexDir)
      }
      .start()

  /** Top-k cosine query over the accumulated index: ranks cells for
    * each query against the frozen model DRIVER-side (the query set
    * is request-scale by definition; k·dims integer math), then scans
    * ONLY the probed cell partitions — the `isin` filter becomes a
    * parquet PartitionFilter, so the 1/kCells scan bound is enforced
    * by the storage layout. Exact cosine rerank within the probed
    * cells, same tie-break as [[Ann.knnIvfTrained]].
    */
  def queryIndex(spark: SparkSession, indexDir: String, modelPath: String,
      queries: DataFrame, k: Int, probes: Int = 1): DataFrame = {
    import spark.implicits._
    val cent = loadModel(modelPath).getOrElse(
      throw new IllegalStateException(s"no trained model at $modelPath"))
    val qRows = quantize(queries).collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
    val probeRows = qRows.flatMap { case (qId, qv, qn2) =>
      cent.map { case (cId, cv, cn2) =>
        val dot = qv.zip(cv).map { case (a, b) => a * b }.sum
        (qn2 - 2L * dot + cn2, cId)
      }.sorted.take(probes).map { case (_, cId) => (qId, cId, qv, qn2) }
    }.toSeq
    val probeDf = probeRows.toDF("q_id", "qcell", "qv", "qn2")
    val cells = probeRows.map(_._2).distinct
    val idx = spark.read.parquet(indexDir)
      .filter(col("cell").isin(cells: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    idx.join(broadcast(probeDf),
        col("cell") === col("qcell") && col("vec_id") =!= col("q_id"))
      .withColumn("cos", Ann.cosine(col("qv"), col("v"),
        col("qn2"), col("norm2")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        round(col("cos") * 10000, 0).cast("long").as("cos_bp"))
  }
}
