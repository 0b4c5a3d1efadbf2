package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion, BinaryExpression, ExpectsInputTypes, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `size(array_intersect(a, b))` / `size(array_union(a, b))` rewritten to
  * direct cardinality counting — similarity joins (Jaccard) only need the
  * SIZES, but the naive plan materializes the full intersection/union array
  * per pair before counting it. These expressions count with two hash sets
  * and allocate nothing per row beyond them.
  *
  * Installed by [[graft.GraftExtensions]] as an optimizer rule
  * ([[RewriteSetSizes]]), so user code keeps the declarative
  * `size(array_intersect(...))` form and the optimizer swaps the physical
  * computation — the Catalyst-native way to optimize a hot pattern.
  *
  * Semantics guard: the rule fires only for string/integral element types
  * (for floating-point elements, Spark's set ops have bespoke NaN/-0.0
  * normalization that java.util.HashSet equality does not reproduce).
  */
object SetSizeSupport {
  def supported(dt: DataType): Boolean = dt match {
    case ArrayType(StringType | LongType | IntegerType | ShortType | ByteType | BooleanType, _) => true
    case _ => false
  }

  /** |distinct(a) ∩ distinct(b)| with Spark's null-element semantics
    * (null counts iff present in both sides).
    */
  def intersectSize(a: ArrayData, b: ArrayData, et: DataType): Int = {
    val right = new java.util.HashSet[Any]()
    var rightHasNull = false
    var i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) rightHasNull = true
      else right.add(b.get(i, et))
      i += 1
    }
    val counted = new java.util.HashSet[Any]()
    var count = 0
    var countedNull = false
    i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) {
        if (rightHasNull && !countedNull) { count += 1; countedNull = true }
      } else {
        val v = a.get(i, et)
        if (right.contains(v) && counted.add(v)) count += 1
      }
      i += 1
    }
    count
  }

  /** |distinct(a ∪ b)| with null counted once if present in either. */
  def unionSize(a: ArrayData, b: ArrayData, et: DataType): Int = {
    val seen = new java.util.HashSet[Any]()
    var hasNull = false
    def scan(arr: ArrayData): Unit = {
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (arr.isNullAt(i)) hasNull = true else seen.add(arr.get(i, et))
        i += 1
      }
    }
    scan(a); scan(b)
    seen.size + (if (hasNull) 1 else 0)
  }
}

/** `legacyNull` mirrors Size's legacySizeOfNull (true when ANSI mode is off):
  * size(NULL) = -1 instead of NULL. Both modes are supported so the rewrite
  * is faithful under either session config.
  */
sealed trait SetSizeExpr extends BinaryExpression with ExpectsInputTypes {
  def legacyNull: Boolean
  protected def staticCall: String

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = !legacyNull && super.nullable
  override def inputTypes: Seq[DataType] =
    Seq(left.dataType, right.dataType) // validated by the rewrite guard
  protected def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  private def compute(a: Any, b: Any): Int = staticCall match {
    case "intersectSize" => SetSizeSupport.intersectSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], elementType)
    case _ => SetSizeSupport.unionSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], elementType)
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) { if (legacyNull) -1 else null }
    else compute(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("etype", elementType)
    if (!legacyNull) {
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SetSizeSupport.$staticCall($a, $b, $et)")
    } else {
      val l = left.genCode(ctx)
      val r = right.genCode(ctx)
      ev.copy(
        code = code"""
          ${l.code}
          ${r.code}
          int ${ev.value} = -1;
          if (!${l.isNull} && !${r.isNull}) {
            ${ev.value} = graft.functions.SetSizeSupport.$staticCall(${l.value}, ${r.value}, $et);
          }""",
        isNull = FalseLiteral)
    }
  }
}

case class IntersectSize(left: Expression, right: Expression,
                         legacyNull: Boolean) extends SetSizeExpr {
  override def prettyName: String = "intersect_size"
  override protected def staticCall: String = "intersectSize"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectSize =
    copy(left = l, right = r)
}

case class UnionSize(left: Expression, right: Expression,
                     legacyNull: Boolean) extends SetSizeExpr {
  override def prettyName: String = "union_size"
  override protected def staticCall: String = "unionSize"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UnionSize =
    copy(left = l, right = r)
}

/** The optimizer rule: fold `Size(ArrayIntersect|ArrayUnion)` into the
  * counting expressions when element types are hash-safe.
  */
object RewriteSetSizes extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai: ArrayIntersect, legacy)
          if SetSizeSupport.supported(ai.left.dataType) =>
        IntersectSize(ai.left, ai.right, legacy)
      case Size(au: ArrayUnion, legacy)
          if SetSizeSupport.supported(au.left.dataType) =>
        UnionSize(au.left, au.right, legacy)
    }
}
