package graft.core

/** Uniform config validation — the analog of the reference's
  * tag-driven validator (utils/validation.go:54-121): every rule
  * evaluates, ALL violations are collected (never fail-fast on the
  * first bad knob), and the result is one self-describing line of
  * `field: problem` fragments joined by "; ", with the reference's
  * exact vocabulary ("is empty" / "is zero" / "is less than N" /
  * "is greater than N"). Where Go walks struct tags reflectively,
  * the Scala-first shape is declarative: each config is a case class
  * whose `violations` composes these primitives, and entry points
  * that take flat knob args validate by constructing the config —
  * so a bad `maxSegments=0` or `minSegments > maxSegments` surfaces
  * as a uniform [[Validation.GraftConfigException]] naming every
  * offending field, not as an operator-specific require or a
  * silently wrong plan.
  *
  * The reference's required-gates-the-rest rule is preserved: a
  * numeric knob that fails the implied required check ("is zero")
  * skips its min/max rules (validation.go:109-113), so a zero cap
  * reports once, not three times.
  */
object Validation {

  /** One rule violation on one field. */
  final case class Violation(field: String, error: String) {
    override def toString: String = s"$field: $error"
  }

  /** All violations of one config, aggregated — the thrown form of
    * the reference's joined result string.
    */
  final class GraftConfigException(
      val config: String,
      val violations: Seq[Violation])
    extends IllegalArgumentException(
      s"invalid $config config: ${violations.mkString("; ")}")

  // ---- rule primitives (each returns the violations it found) ----

  /** required on strings: "is empty" (validation.go:131). */
  def nonEmpty(field: String, v: String): Seq[Violation] =
    if (v == null || v.isEmpty) Seq(Violation(field, "is empty")) else Nil

  /** required on collections: "is empty". */
  def nonEmpty(field: String, v: Iterable[_]): Seq[Violation] =
    if (v == null || v.isEmpty) Seq(Violation(field, "is empty")) else Nil

  /** required on numerics: "is zero" (validation.go:133). */
  def nonZero(field: String, v: Long): Seq[Violation] =
    if (v == 0L) Seq(Violation(field, "is zero")) else Nil

  def min(field: String, v: Long, bound: Long): Seq[Violation] =
    if (v < bound) Seq(Violation(field, s"is less than $bound")) else Nil

  def max(field: String, v: Long, bound: Long): Seq[Violation] =
    if (v > bound) Seq(Violation(field, s"is greater than $bound")) else Nil

  def min(field: String, v: Double, bound: Double): Seq[Violation] =
    if (v < bound) Seq(Violation(field, s"is less than $bound")) else Nil

  def max(field: String, v: Double, bound: Double): Seq[Violation] =
    if (v > bound) Seq(Violation(field, s"is greater than $bound")) else Nil

  /** Cross-field ordering (the reference's min>max case — tags can't
    * express it, its callers re-check by hand; here it is first-class).
    */
  def atMost(field: String, v: Long, otherField: String,
      other: Long): Seq[Violation] =
    if (v > other) Seq(Violation(field, s"is greater than $otherField ($other)"))
    else Nil

  /** Escape hatch for config-specific predicates. */
  def check(field: String, ok: Boolean, error: => String): Seq[Violation] =
    if (ok) Nil else Seq(Violation(field, error))

  /** One numeric knob under the reference's evaluation order: the
    * implied required check runs first and, when it fails, gates the
    * min/max rules (validation.go:109-113). Knobs that legitimately
    * allow zero (a grace of 0 = eager) pass `requiredNonZero=false`.
    */
  def knob(field: String, v: Long,
      minV: Long = Long.MinValue, maxV: Long = Long.MaxValue,
      requiredNonZero: Boolean = true): Seq[Violation] = {
    val req = if (requiredNonZero) nonZero(field, v) else Nil
    if (req.nonEmpty) req
    else min(field, v, minV) ++ max(field, v, maxV)
  }

  /** Throw the aggregated exception if any rule failed. */
  def validate(config: String, violations: Seq[Violation]): Unit =
    if (violations.nonEmpty)
      throw new GraftConfigException(config, violations)
}

/** A validated knob bundle. Configs are plain case classes; `violations`
  * declares the rules, [[validated]] is the uniform front door every
  * flat-arg entry point calls on construction.
  */
trait GraftConfig extends Serializable {

  /** The config's name in error messages (e.g. "compaction"). */
  def configName: String

  /** Every rule violation, all evaluated — never just the first. */
  def violations: Seq[Validation.Violation]

  /** Returns this config, or throws [[Validation.GraftConfigException]]
    * listing every violation.
    */
  final def validated: this.type = {
    Validation.validate(configName, violations)
    this
  }
}
