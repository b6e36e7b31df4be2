package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Native Catalyst expression: exact integer dot product of two
  * `array<long>` columns in ONE compiled loop — the codegen'd form of
  * `VectorOps.intDotCol`'s `aggregate(zip_with(a, b, _ * _), 0L, _ + _)`
  * fold. That HOF formulation is the µ-unit selection kernel of the
  * whole integer-contract family (θ-gates, margin mining, SemDeDup,
  * candidate re-ranks), and it runs INTERPRETED per element — the
  * measured cost driver of the IVF candidate join (~750k candidate
  * pairs × 128-dim at sf0.1). Same fused-loop rationale as
  * [[CosinePair]].
  *
  * Semantics are BIT-EQUAL with the HOF fold under ANSI, pinned by a
  * parity spec across every branch:
  *   - null array on either side → NULL;
  *   - length mismatch: `zip_with` pads the shorter side with null, a
  *     null operand makes that product null, and a null element
  *     poisons the running sum → NULL (any per-element null, ditto);
  *   - empty arrays → 0 (the fold's zero element);
  *   - ANSI overflow ORDER: `zip_with` materializes EVERY product
  *     before the fold sums them, so a product overflow throws even
  *     when an earlier element pair was null — while the running sum
  *     goes null-poisoned at the first null pair and never throws
  *     AFTER it. The loop below reproduces exactly that: products are
  *     always `multiplyExact`, the sum is `addExact` only until the
  *     first null.
  *
  * On µ-unit vectors (|component| ≤ 1e6, dims ≤ a few hundred) the
  * exact paths can never overflow — the checks exist so a NON-µ-unit
  * caller fails as loudly as the HOF form would, not silently wraps.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int_dot needs two array<long> inputs, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.max(nx, ny)
    var acc = 0L
    var nullSeen = false
    var i = 0
    while (i < n) {
      if (i >= nx || i >= ny || x.isNullAt(i) || y.isNullAt(i))
        nullSeen = true
      else {
        val p = Math.multiplyExact(x.getLong(i), y.getLong(i))
        if (!nullSeen) acc = Math.addExact(acc, p)
      }
      i += 1
    }
    if (nullSeen) null else acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val n = ctx.freshName("n"); val ns = ctx.freshName("nullSeen")
      val p = ctx.freshName("p")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $n = java.lang.Math.max($nx, $ny);
         |long $acc = 0L;
         |boolean $ns = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i >= $nx || $i >= $ny || $x.isNullAt($i) || $y.isNullAt($i)) {
         |    $ns = true;
         |  } else {
         |    long $p = java.lang.Math.multiplyExact($x.getLong($i), $y.getLong($i));
         |    if (!$ns) { $acc = java.lang.Math.addExact($acc, $p); }
         |  }
         |}
         |if ($ns) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object IntDotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    toColumn(IntDotProduct(toExpression(a), toExpression(b)))
}
