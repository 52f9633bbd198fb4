package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingAnn

/** Prices the ST7 model-drift remedy: wall time of a full
  * [[StreamingAnn.retrainIndex]] (train a new generation on the
  * visible corpus + rebuild every cell + atomic cutover) vs the
  * incremental alternative ([[StreamingAnn.compactIndex]], which
  * merges leaves under the FROZEN model) at 1× and N× corpus size —
  * the cost model `retrainIfNeeded`'s trigger threshold needs next to
  * its drift signal (BASELINE §ANN quality).
  *
  * Protocol matches ScaleStress: both scales in ONE JVM (this host
  * throttles episodically; cross-window comparisons are garbage), N×
  * corpus from per-copy cyclic dim shifts (norm/cosine-preserving
  * within copies, decorrelated across), per-phase timings medianed
  * over reps. The index build (file-stream ingest in 3 batches) is
  * timed separately so the retrain/compact numbers are pure
  * maintenance cost, not setup.
  *
  * Usage: `graft.tools.RetrainPrice [sfDir] [factor] [reps]` → one
  * JSON line `{"metric":"retrain_price", ...}`.
  */
object RetrainPrice {

  private def fmtD(v: Double): String =
    "%.2f".formatLocal(java.util.Locale.ROOT, v)

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def cp(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      Option(src.listFiles()).foreach(_.foreach(f =>
        cp(f, new java.io.File(dst, f.getName))))
    } else {
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }

  /** Build an index at `root` from `embDir` via the production ingest
    * (3 file-stream batches → 3 leaves per cell: enough aged batches
    * for a real compaction). Returns build seconds.
    */
  private def build(spark: SparkSession, embDir: String,
      root: String): Double = {
    val t0 = System.nanoTime()
    val emb = spark.read.parquet(embDir)
    val staging = s"$root/staging"
    new java.io.File(staging).mkdirs()
    val q = StreamingAnn.ivfIngest(
      spark.readStream.schema(emb.schema).parquet(staging),
      s"$root/model.txt", s"$root/index", s"$root/ckpt",
      kCells = 8, iterations = 2)
    try {
      (0 until 3).foreach { b =>
        emb.filter(col("vec_id") % 3 === b)
          .write.mode("append").parquet(staging)
        q.processAllAvailable()
      }
    } finally q.stop()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files
      .createTempDirectory("graft-retrain-").toAbsolutePath.toString

    // N× embeddings via the ScaleStress dim-shift construction
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until factor).map { i =>
      val shift = i % graft.operators.Ann.Dims
      val shifted =
        if (shift == 0) col("embedding")
        else concat(
          slice(col("embedding"), shift + 1, graft.operators.Ann.Dims - shift),
          slice(col("embedding"), 1, shift))
      emb.select((col("vec_id") + lit(i * 1000000000L)).as("vec_id"),
        shifted.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$work/embNx.parquet")

    def phase(scaleTag: String, embDir: String,
        kCells: Int): Map[String, Double] = {
      val runs = (1 to reps).map { r =>
        val root = s"$work/$scaleTag-rep$r"
        val tBuild = build(spark, embDir, root)
        // both remedies must be priced from the SAME decision-point
        // state (the 3-leaf post-build index): snapshot the index
        // before either runs, compact on the original, retrain on the
        // snapshot (r16 advice — retraining the already-compacted
        // index biased retrain cost down)
        cp(new java.io.File(s"$root/index"),
          new java.io.File(s"$root/index_retrain"))
        val t0 = System.nanoTime()
        val compacted = StreamingAnn.compactIndex(spark, s"$root/index",
          minBatches = 2)
        val tCompact = (System.nanoTime() - t0) / 1e9
        require(compacted.nonEmpty, s"compaction no-op at $scaleTag")
        val t1 = System.nanoTime()
        StreamingAnn.retrainIndex(spark, s"$root/index_retrain",
          kCells = kCells, iterations = 2)
        val tRetrain = (System.nanoTime() - t1) / 1e9
        System.err.println(s"[retrainprice] $scaleTag rep $r: " +
          s"build=${fmtD(tBuild)} compact=${fmtD(tCompact)} " +
          s"retrain=${fmtD(tRetrain)} kcells=$kCells")
        rm(new java.io.File(root))
        Map("build" -> tBuild, "compact" -> tCompact, "retrain" -> tRetrain)
      }
      Seq("build", "compact", "retrain").map(k =>
        k -> median(runs.map(_(k)))).toMap
    }

    val rows1 = emb.count()
    val base = phase("1x", s"$src/embeddings.parquet", kCells = 8)
    // grown k at the grown corpus: the documented drift remedy shape
    // (r15 measured same-k retrain cannot split a piled mode)
    val big = phase(s"${factor}x", s"$work/embNx.parquet",
      kCells = 8 * factor)
    val bigSameK = phase(s"${factor}x-k8", s"$work/embNx.parquet",
      kCells = 8)

    rm(new java.io.File(work))
    def fmt(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"""\"$k\":${fmtD(v)}""" }
        .mkString("{", ",", "}")
    println(s"""{"metric":"retrain_price","factor":$factor,"reps":$reps""" +
      s""","rows_1x":$rows1,"base":${fmt(base)}""" +
      s""","scaled_kgrown":${fmt(big)},"scaled_k8":${fmt(bigSameK)}}""")
    spark.stop()
  }
}
