package graft.tools

import org.apache.spark.sql.SparkSession

/** Prices distributed BPE TRAINING (graft.operators.BpeTrainer) at the
  * production table depth: the gated row trains 24 merges, but a real
  * tokenizer table is ~2000 — i.e. ~2000 SEQUENTIAL argmax jobs each
  * collecting exactly 1 row, plus a replace projection per merge and a
  * localCheckpoint every 64. This tool measures that shape directly on
  * sf0.1 at several depths so BASELINE records a measured per-merge
  * latency curve instead of the r17 verdict's ~0.2 s/job estimate.
  *
  * Usage: java -cp 'target/scala-2.13/classes:SPARK_JARS' \
  *   graft.tools.BpeDepthPrice [sfDir] [depths,comma,separated] [batchT]
  * Prints one JSON line: wall seconds + merges completed per depth
  * (training can stop early if the vocabulary runs dry — the merge
  * count is part of the record), plus per-depth sec/merge, the count
  * pass total, and the mean batch size (batchT = 1 prices the classic
  * one-merge-per-job chain; the default prices the batched selector).
  */
object BpeDepthPrice {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val depths =
      if (args.length > 1) args(1).split(",").toSeq.map(_.toInt)
      else Seq(100, 500, 2000)
    val batchT =
      if (args.length > 2) args(2).toInt
      else graft.operators.BpeTrainer.DefaultBatchT
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)

    val rows = depths.map { d =>
      val t0 = System.nanoTime()
      val (mdf, sizes) =
        graft.operators.BpeTrainer.trainMergesWithStats(docs, d, batchT)
      val merges = mdf.count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bpeprice] depth $d: $merges merges in $sec%.1f s " +
        f"(${sizes.length} passes, batchT=$batchT)")
      (d, merges, sec, sizes.length)
    }
    val dJson = rows.map { case (d, m, s, p) =>
      f""""$d":{"merges":$m,"sec":$s%.2f,"sec_per_merge":${s / math.max(m, 1)}%.4f,"passes":$p,"avg_batch":${m.toDouble / math.max(p, 1)}%.2f}"""
    }.mkString(",")
    println(s"""{"metric":"bpe_depth_price","sf_dir":"$sfDir","batch_t":$batchT,"depths":{$dJson}}""")
    spark.stop()
  }
}
