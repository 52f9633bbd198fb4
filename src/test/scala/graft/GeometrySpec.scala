package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** MinHash band-geometry specs: pins the measured candidate
  * probability on a CONSTRUCTED similarity ladder against the analytic
  * S-curve P(candidate) = 1 − (1 − s^rows)^bands for both the default
  * (4×2) and production (16×8) geometries — the check that makes the
  * geometry parameter real rather than decorative, and records the
  * candidate-volume ratio that is the whole point of the wider
  * geometry (the 100 TB verify-join fanout from mid-similarity pairs).
  */
class GeometrySpec extends SparkSuite {

  /** Union size per planted pair and pairs per similarity level. */
  private val U = 200
  private val NPairs = 300
  /** Ladder of true Jaccard similarities, in basis points. */
  private val Levels = Seq(3000, 5000, 8000, 9500)

  /** Constructed ladder: pair p at level l is docs (2·idx, 2·idx+1)
    * sharing exactly s·U of their U-shingle union (each side pads with
    * (U − shared)/2 private shingles, so |A| = |B| and J = s exactly).
    * Every pair draws from its own disjoint hash universe — candidates
    * across pairs would need 20-bit hash collisions and don't occur
    * here — and hashes are golden-ratio mixed so the affine minhash
    * family sees well-spread 20-bit inputs, like real shingle hashes.
    */
  /** splitmix64 finalizer: a sequential counter in, a well-mixed
    * positive 60-bit hash out (a raw Weyl sequence `n * golden` is
    * low-discrepancy and confounds the affine minhash family with
    * systematic cross-pair coincidences).
    */
  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) >>> 4
  }

  private lazy val ladder = {
    import spark.implicits._
    val rows = for {
      (bp, li) <- Levels.zipWithIndex
      p <- 0 until NPairs
      pairIdx = li * NPairs + p
      shared = U * bp / 10000
      own = (U - shared) / 2
      (docOff, localIdx) <- (0 until shared).flatMap(j => Seq((0, j), (1, j))) ++
        (0 until own).map(j => (0, shared + j)) ++
        (0 until own).map(j => (1, shared + own + j))
    } yield (pairIdx.toLong * 2 + docOff, mix(pairIdx.toLong * 1024 + localIdx))
    rows.toDF("doc_id", "h").cache()
  }

  private def measured(bands: Int, rows: Int,
      maxUnplanted: Int = 5): Map[Int, Double] = {
    val sig = Dedup.minhashSignatures(ladder, bands * rows)
    val cands = Dedup.lshCandidates(sig, bands, rows)
      // planted pairs only (cross-pair candidates would be hash
      // accidents; assert none below)
      .withColumn("planted",
        col("doc_b") === col("doc_a") + 1 && col("doc_a") % 2 === 0)
    val all = cands.count()
    val byLevel = cands.filter(col("planted"))
      .withColumn("level", (col("doc_a") / 2 / NPairs).cast("int"))
      .groupBy("level").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // a few cross-pair coincidences are legitimate minhash behavior
    // (P ≈ J(accidental h20 overlap) per hash); systematic leakage
    // is not
    assert(all - byLevel.values.sum <= maxUnplanted,
      s"${all - byLevel.values.sum} unplanted cross-pair candidates " +
        s"at $bands x $rows")
    Levels.indices.map(li =>
      Levels(li) -> byLevel.getOrElse(li, 0L).toDouble / NPairs).toMap
  }

  private def analytic(bp: Int, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(bp / 10000.0, rows.toDouble), bands.toDouble)

  test("candidate probability tracks 1-(1-s^r)^b on both geometries") {
    for ((b, r) <- Seq((Dedup.MinHashBands, Dedup.MinHashRows),
        (Dedup.ProdBands, Dedup.ProdRows))) {
      val m = measured(b, r)
      Levels.foreach { bp =>
        val exp = analytic(bp, b, r)
        val got = m(bp)
        info(f"geometry ${b}x$r s=${bp / 10000.0}%.2f: measured $got%.3f analytic $exp%.3f")
        assert(math.abs(got - exp) < 0.10,
          f"geometry ${b}x$r s=$bp bp: measured $got%.3f vs analytic $exp%.3f")
      }
    }
  }

  test("production geometry cuts mid-similarity candidate volume ~10x") {
    val def50 = measured(Dedup.MinHashBands, Dedup.MinHashRows)(5000)
    val prod50 = measured(Dedup.ProdBands, Dedup.ProdRows)(5000)
    val def95 = measured(Dedup.MinHashBands, Dedup.MinHashRows)(9500)
    val prod95 = measured(Dedup.ProdBands, Dedup.ProdRows)(9500)
    info(f"s=0.50 candidates/pair: default $def50%.3f prod $prod50%.3f")
    info(f"s=0.95 candidates/pair: default $def95%.3f prod $prod95%.3f")
    // the fanout claim: at s=0.5 the wide geometry admits a small
    // fraction of what 4x2 admits (analytic 0.065 vs 0.684)...
    assert(prod50 < def50 / 4,
      f"prod geometry admitted $prod50%.3f of s=0.5 pairs vs default $def50%.3f")
    // ...while true near-dups stay essentially certain candidates
    assert(prod95 > 0.95 && def95 > 0.95)
  }

  test("audit geometry 64x2: near-total recall across the mid band") {
    // nearDupAudit's claim — narrow bands + exact verify see the pairs
    // the 16x8 ingest S-curve misses — rests on 64x2 admitting
    // essentially EVERY pair from mid similarity up (analytic
    // 1-(1-s^2)^64: 0.997 at s=0.3, ~1 above). Measure it on the same
    // ladder. 64 two-row bands give each cross pair 16x the accident
    // chances of 4x2, so the unplanted bound scales with bands (the
    // accidents are per-band 20-bit coincidences, not leakage)
    val m = measured(64, 2, maxUnplanted = 80)
    Levels.foreach { bp =>
      val exp = analytic(bp, 64, 2)
      info(f"geometry 64x2 s=${bp / 10000.0}%.2f: measured ${m(bp)}%.3f analytic $exp%.3f")
    }
    assert(m(3000) > 0.95, f"s=0.30 recall ${m(3000)}%.3f")
    assert(m(5000) > 0.99, f"s=0.50 recall ${m(5000)}%.3f")
    assert(m(8000) > 0.99 && m(9500) > 0.99)
  }

  test("hash family: entries 0-7 are the legacy literals, 8+ in range") {
    val n = Dedup.ProdBands * Dedup.ProdRows
    val ps = Dedup.hashParams(n)
    assert(ps.take(8) === Dedup.HashA.zip(Dedup.HashB))
    ps.foreach { case (a, bb) =>
      assert(a % 2 === 1 && a > 0 && a < 1048576, s"a=$a")
      assert(bb >= 0 && bb < 1048576, s"b=$bb")
    }
    // distinct params — a repeated (a, b) would duplicate a hash
    assert(ps.distinct.size === n)
  }

  test("band-key combiner: legacy packing for 2 rows, bounded fold wider") {
    assert(Dedup.bandKeyExpr(Seq("mh0", "mh1")) === "mh0 * 1048583 + mh1")
    val wide = Dedup.bandKeyExpr(Seq("a", "b", "c", "d"))
    assert(wide.contains("% 2147483647")) // stays inside i64 at any width
  }
}
