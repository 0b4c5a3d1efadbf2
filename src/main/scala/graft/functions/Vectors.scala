package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity family.
  *
  * Rationale (measured at sf0.1): the SQL higher-order formulation
  * `aggregate(zip_with(a, b, ...), ...)` materializes a fresh intermediate
  * array per evaluation — on a 2M-pair cosine join that is 6M transient
  * 64-element arrays plus lambda dispatch, and the exact-pair query ran
  * 73 s. This primitive loop does the identical left-to-right fold with
  * zero allocation (same addition order ⇒ bit-identical doubles ⇒ oracle
  * hashes unchanged) and stays inside whole-stage codegen.
  */
object Vectors {

  /** Σ a_i·b_i, accumulated left-to-right (the same fold order as the SQL
    * `aggregate` it replaces). Folds over the common prefix — defensive
    * against length mismatch; the expression layer (`DotProduct`) still
    * turns a mismatch into NULL before this kernel sees it, so production
    * semantics are unchanged (a partial score never escapes).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Random-hyperplane sign sketch: bit j = sign of Σ_d v_d · s(seed,j,d),
    * with ±1 signs drawn from mix64 bit streams — one hash per plane per
    * 64 dims (the SQL-lambda form paid one `hash()` call per (j,d) PAIR).
    * Deterministic in (seed, j, d); `seed` doubles as the band id for
    * banded LSH families.
    */
  def hyperplaneSketch(v: ArrayData, seed: Long, nPlanes: Int): Long = {
    val dim = v.numElements()
    var sig = 0L
    var j = 0
    while (j < nPlanes) {
      val hj = Sketches.mix64(seed * 1000003L + j)
      var s = 0.0
      var d = 0
      var block = Sketches.mix64(hj)
      while (d < dim) {
        if ((d & 63) == 0 && d > 0) block = Sketches.mix64(hj + (d >>> 6))
        s += v.getDouble(d) * (if (((block >>> (d & 63)) & 1L) == 1L) 1.0 else -1.0)
        d += 1
      }
      if (s >= 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** `hyperplane_sketch(vec, seed)` — nPlanes-bit sign sketch. */
case class HyperplaneSketch(left: Expression, right: Expression, nPlanes: Int)
    extends BinaryExpression with ExpectsInputTypes {
  // sig is one Long; `1L << j` wraps modulo 64, so plane 64 would silently
  // alias plane 0 — reject at construction (= analysis time for SQL calls)
  require(nPlanes >= 1 && nPlanes <= 64,
    s"hyperplane_sketch: nPlanes must be in [1, 64], got $nPlanes")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sketch"
  override protected def nullSafeEval(v: Any, seed: Any): Any =
    Vectors.hyperplaneSketch(v.asInstanceOf[ArrayData], seed.asInstanceOf[Long], nPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, s) => s"graft.functions.Vectors.hyperplaneSketch($v, $s, $nPlanes)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): HyperplaneSketch =
    copy(left = newLeft, right = newRight)
}

/** `dot_product(a, b)` over two double arrays. Length mismatch → NULL (the
  * null-propagation the SQL zip_with form had: a truncated/corrupt vector
  * must fall out of similarity filters, not receive a plausible partial
  * score).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (aa.numElements() != bb.numElements()) null else Vectors.dot(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Vectors.dot($a, $b);
         |}""".stripMargin)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
