package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for dense-vector similarity over
 * `array<float>` / `array<double>` embedding columns.
 *
 * The composed alternative (`zip_with` + `aggregate`, see
 * [[graft.functions.VectorFunctions]]) allocates an intermediate array
 * and evaluates a lambda per element; at 100 TB that allocation is the
 * scan bottleneck. These expressions generate a single fused loop over
 * the two ArrayData buffers — one pass, zero allocation, stays inside
 * whole-stage codegen.
 */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // a null ELEMENT makes the whole result null (matching the zip_with/
  // aggregate fallback, which propagates null) — so the expression is
  // nullable whenever the array type admits null elements
  override def nullable: Boolean =
    left.nullable || right.nullable || anyElemNullable

  // inputs must be array<float> or array<double>; enforced by the typed
  // builders in graft.functions.VectorFunctions (AbstractDataType /
  // ExpectsInputTypes are sql-private, so analyzer-level type coercion
  // is not available to external expressions)
  protected def leftElemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"$prettyName expects array<float|double>, got $t")
  }
  protected def rightElemIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"$prettyName expects array<float|double>, got $t")
  }

  /** true when either input array may hold null elements; only then do
    * the fused loops pay a per-element isNullAt branch (for the common
    * containsNull=false embedding column the loop stays branch-free) */
  protected lazy val anyElemNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
  }

  @inline protected final def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** codegen: mark the result null and bail when element i is null —
    * empty when the types guarantee non-null elements (ev.isNull is a
    * real variable in the nullable case, so the assignment compiles) */
  protected def elemNullCheck(ev: ExprCode, a: String, b: String, i: String): String =
    if (anyElemNullable)
      s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
    else ""

  /** java accessor snippet for codegen */
  protected def getter(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Σ aᵢ·bᵢ over the common prefix of the two vectors. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "vector_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (anyElemNullable && (a.isNullAt(i) || b.isNullAt(i))) return null
      sum += elem(a, i, leftElemIsFloat) * elem(b, i, rightElemIsFloat)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${elemNullCheck(ev, a, b, i)}
         |  $sum += ${getter(a, i, leftElemIsFloat)} * ${getter(b, i, rightElemIsFloat)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** cosine(a, b) in one fused pass (dot + both norms); 0.0 when either
  * vector has zero norm. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "vector_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (anyElemNullable && (a.isNullAt(i) || b.isNullAt(i))) return null
      val x = elem(a, i, leftElemIsFloat)
      val y = elem(b, i, rightElemIsFloat)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${elemNullCheck(ev, a, b, i)}
         |  double $x = ${getter(a, i, leftElemIsFloat)};
         |  double $y = ${getter(b, i, rightElemIsFloat)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** ‖a − b‖₂ in one fused pass. */
case class L2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "vector_l2_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (anyElemNullable && (a.isNullAt(i) || b.isNullAt(i))) return null
      val d = elem(a, i, leftElemIsFloat) - elem(b, i, rightElemIsFloat)
      sum += d * d; i += 1
    }
    math.sqrt(sum)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${elemNullCheck(ev, a, b, i)}
         |  double $d = ${getter(a, i, leftElemIsFloat)} - ${getter(b, i, rightElemIsFloat)};
         |  $sum += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($sum);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
