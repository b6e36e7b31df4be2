package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Native Catalyst expression: asymmetric-distance (ADC) score for a
  * product-quantized code array — `sum_s table[s*ks + (code_s + 128)]`,
  * where `table` is the query's per-subspace lookup of
  * `dot(query_sub_s, codebook_s[c])` over normalized vectors, so the
  * sum approximates the cosine similarity of the query against the
  * decoded vector.
  *
  * The lookup table (m·ks doubles, one per query) ships as ONE
  * reference object via `ctx.addReferenceObj` — same discipline as
  * [[NearestCentroid]]: the generated code is a fixed m-iteration
  * loop regardless of ks, never a literal expression tree. Codes are
  * stored offset by -128 (0..255 → -128..127) so they fit a signed
  * byte under ANSI casts; the `+ 128` here undoes it.
  */
case class PqAdcScore(child: Expression, table: Array[Double], ks: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  private val m: Int = if (ks <= 0) 0 else table.length / ks

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(ByteType, _) if ks > 0 && table.length == m * ks =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_score needs array<tinyint> codes and a m*ks table, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), m)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += table(i * ks + (arr.getByte(i) + 128))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("adcTable", table, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $m);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $tRef[$i * $ks + (((int) $arr.getByte($i)) + 128)];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}

object PqAdcScore {
  /** Column-level entry point. */
  def apply(codes: Column, table: Array[Double], ks: Int): Column =
    toColumn(PqAdcScore(toExpression(codes), table, ks))
}
