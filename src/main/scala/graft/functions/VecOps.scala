package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions for the ANN family's integer-vector
  * hot paths.
  *
  * The composed alternatives (`aggregate(zip_with(...))` for the dot
  * product; posexplode → crossJoin(planes) → two groupBys for the
  * hyperplane bucket) are higher-order/relational forms: the former
  * allocates an intermediate array per evaluation and stays outside
  * whole-stage codegen, the latter shuffles 64×8 rows per vector.
  * These expressions evaluate inside the generated loop — one fused
  * multiply-add pass per row, zero shuffles — which is the difference
  * between a scan-rate kNN and a shuffle-bound one at 100 TB.
  *
  * Semantics are IDENTICAL to the composed forms (exact integer
  * arithmetic over milli-quantized components), so the DuckDB oracles
  * are unchanged.
  */
object VecOps {

  /** Σ a(i)·b(i) over the common prefix — exact long arithmetic. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** All `numPlanes` hyperplane signs of `v` in one pass:
    * bit p set iff Σ_d v(d)·coef(p,d) > 0 with
    * coef(p,d) = ((1103515245·(p·dims+d) + 12345) mod 2001) − 1000 —
    * the same deterministic pseudo-random coefficients the SQL oracle
    * derives arithmetically.
    */
  def hyperplaneBucket(v: ArrayData, numPlanes: Int): Long = {
    val dims = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      var s = 0L
      var d = 0
      while (d < dims) {
        val coef = (1103515245L * (p * dims + d) + 12345L) % 2001L - 1000L
        s += v.getLong(d) * coef
        d += 1
      }
      if (s > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  /** The Achlioptas ternary sign coefficient r(j,d) ∈ {+1, −1, 0} of
    * output dim `j` × input dim `d`: the portable 60-bit md5 hash of
    * the cell's name, thirded — `hexHash60("rp:j:d") mod 3 − 1` — so
    * the SQL oracle restates it verbatim through the same md5 rule
    * every hash-gated operator already shares (no shipped matrix, no
    * RNG state: the projection IS its formula).
    *
    * Why md5 and not the hyperplane LCG: an LCG-mod-m sequence
    * reshaped into a 16×64 matrix has strongly correlated rows (one
    * arithmetic progression, short lattice period), and the measured
    * rerank recall was HALF that of an independently-mixed matrix at
    * every geometry (13% vs 27% @ 16 dims/shortK 50 on sf0.1) — and,
    * worse, did not improve with outDims. JL's guarantee assumes
    * i.i.d.-ish entries; per-cell md5 delivers that and costs nothing
    * (the matrix is built once per (outDims, dims) and cached).
    */
  def rpCoef(j: Int, d: Int): Long =
    Portable.jvmHexHash60(s"rp:$j:$d".getBytes("UTF-8")) % 3L - 1L

  private val rpMatrixCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), Array[Long]]

  /** The cached (outDims × dims) sign matrix, row-major. */
  def rpMatrix(outDims: Int, dims: Int): Array[Long] =
    rpMatrixCache.getOrElseUpdate((outDims, dims), {
      val m = new Array[Long](outDims * dims)
      var j = 0
      while (j < outDims) {
        var d = 0
        while (d < dims) { m(j * dims + d) = rpCoef(j, d); d += 1 }
        j += 1
      }
      m
    })

  /** All `outDims` Johnson–Lindenstrauss projections of `v` in one
    * fused pass: p(j) = Σ_d v(d)·r(j,d) with the [[rpCoef]] sign
    * matrix — exact long arithmetic, identical in SQL. The matrix is
    * one cached array per (outDims, dims); the per-row work is a pure
    * multiply-add loop.
    */
  def jlProject(v: ArrayData, outDims: Int): ArrayData = {
    val dims = v.numElements()
    val m = rpMatrix(outDims, dims)
    val out = new Array[Long](outDims)
    var j = 0
    while (j < outDims) {
      var s = 0L
      var d = 0
      val base = j * dims
      while (d < dims) {
        s += v.getLong(d) * m(base + d)
        d += 1
      }
      out(j) = s
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Integer dot product of two `array<long>` columns. */
  def intDot(a: Column, b: Column): Column =
    SqlBridge.column(IntDotExpr(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Hyperplane LSH bucket of an `array<long>` column. */
  def hyperplaneBucket(v: Column, numPlanes: Int): Column =
    SqlBridge.column(HyperplaneBucketExpr(SqlBridge.expression(v), numPlanes))

  /** JL sparse-sign projection of an `array<long>` column to
    * `outDims` exact integer components.
    */
  def jlProject(v: Column, outDims: Int): Column =
    SqlBridge.column(JlProjectExpr(SqlBridge.expression(v), outDims))
}

case class IntDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntDotExpr = copy(left = newLeft, right = newRight)
}

case class HyperplaneBucketExpr(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override protected def nullSafeEval(v: Any): Any =
    VecOps.hyperplaneBucket(v.asInstanceOf[ArrayData], numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecOps.hyperplaneBucket($c, $numPlanes)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
}

case class JlProjectExpr(child: Expression, outDims: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "jl_project"

  override protected def nullSafeEval(v: Any): Any =
    VecOps.jlProject(v.asInstanceOf[ArrayData], outDims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecOps.jlProject($c, $outDims)")

  override protected def withNewChildInternal(newChild: Expression): JlProjectExpr =
    copy(child = newChild)
}
