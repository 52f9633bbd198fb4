package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins. When one join key carries a
  * disproportionate share of rows (a hot user, a hot topic
  * partition), a plain shuffle join lands the whole key on one task.
  * Salting splits the hot side's key into `salts` sub-keys and
  * replicates the other side across all salt values — the hot key's
  * rows spread over `salts` tasks, identical join result.
  *
  * At local scale AQE's skew-join handles moderate skew automatically;
  * explicit salting is for the pathological keys AQE can't split
  * (single-key hotspots in a 1000-executor shuffle).
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small` on `key`,
    * spread over `salts` sub-keys. `small` is replicated `salts`×
    * (explode over the salt range), so keep it the smaller input.
    *
    * The salt is `hash(whole row) mod salts` — fully deterministic
    * from row content (stable under task retry AND repartitioning,
    * unlike a seeded rand, which is only partition-deterministic), and
    * it spreads a hot key's rows because they differ in their other
    * columns. Exact duplicate rows share a salt; they are the one case
    * salting cannot split (and the join result is still identical).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
