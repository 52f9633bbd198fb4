package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Portable._

/** Deterministic, oracle-checkable sketches.
  *
  * Engine-native sketches (HLL registers, theta samples) are
  * layout-specific: two engines agree only approximately, so a gated
  * exact-match harness can't verify them. KMV (k minimum values,
  * Bar-Yossef et al. 2002) is different: the sketch IS the k smallest
  * distinct values of a shared deterministic hash, so every element of
  * the sketch — and therefore the estimate — is bit-identical in any
  * engine that agrees on the hash. Same portability idea as the
  * quantized-cosine family: pick the representation where exactness is
  * possible, then the oracle gates it exactly.
  */
object Sketch {
  /** Sketch size: estimate relative error ~ 1/sqrt(k-2) ≈ 6%. */
  val KmvK = 256

  /** KMV distinct-token sketch per language plus the corpus-wide
    * merge ("ALL"). Output per group: exact distinct count (the audit
    * twin a 100 TB run would drop), sketch fill `k_actual`, the k-th
    * minimum hash `h_k`, and the KMV estimate
    * `round((k−1)·2^60 / h_k)` — one IEEE division + one HALF_UP
    * round, bit-identical across engines (the [[graft.operators.Ann]]
    * cosine pattern). A group with fewer than k distinct tokens has
    * the exact count as its estimate (the sketch saw everything).
    *
    * Mergeability — the reason KMV is the 100 TB shape: the sketch of
    * a union is the k smallest of the concatenated sketches, so
    * per-partition sketches combine associatively (here the "ALL" row
    * is exactly the merge of the per-language rows; pinned in the
    * spec). Scale: token hashes dedup via a partial-aggregating
    * `distinct` on (grp, h); the k-th minimum per group comes from the
    * house two-level rank (range partition → per-(pid, grp) local
    * rank → broadcast offset table), NEVER a per-group global-sort
    * funnel — the same skeleton as exact quantiles. The hot "ALL"
    * group spans many range partitions; its rank work is distributed
    * across all of them.
    */
  def kmvDistinctTokens(docs: DataFrame, k: Int = KmvK): DataFrame = {
    graft.core.Validation.validate("kmv",
      graft.core.Validation.knob("k", k, minV = 2L))
    val s = docs.sparkSession
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val lh = docs.select(col("lang"),
        explode(split(normText(col("text")), " ")).as("tok"))
      .select(col("lang"), hexHash60(col("tok")).as("h"))
    val grps = lh.select(col("lang").as("grp"), col("h"))
      .unionByName(lh.select(lit("ALL").as("grp"), col("h")))
      .distinct()
    val ranged = grps.repartitionByRange(parts, col("grp"), col("h"))
      .withColumn("pid", spark_partition_id())
    val local = ranged.withColumn("lr",
      row_number().over(Window.partitionBy("pid", "grp").orderBy("h")))
    val counts = local.groupBy("pid", "grp").agg(count(lit(1)).as("n"))
    val offsets = counts
      .withColumn("prior", coalesce(
        sum("n").over(Window.partitionBy("grp").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "grp", "prior")
    val exact = counts.groupBy("grp").agg(sum("n").as("n_exact"))
    // (k−1)·2^60 as an exact double: k−1 ≤ 2^8 keeps the product's
    // mantissa within 53 bits, so the constant itself is lossless
    val num = (k - 1).toDouble * math.pow(2, 60)
    local.join(broadcast(offsets), Seq("pid", "grp"))
      .withColumn("gr", col("lr") + col("prior"))
      .filter(col("gr") <= k)
      .groupBy("grp")
      .agg(count(lit(1)).as("k_actual"), max("h").as("h_k"))
      .join(broadcast(exact), Seq("grp"))
      .select(col("grp"), col("n_exact"), col("k_actual"), col("h_k"),
        when(col("k_actual") < k, col("k_actual"))
          .otherwise(round(lit(num) / col("h_k").cast("double"), 0)
            .cast("long")).as("distinct_est"))
  }
}
