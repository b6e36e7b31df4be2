package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of an array column
  * against a query vector baked in at plan time, fused into ONE loop
  * (dot product + vector norm together) with real `doGenCode` — versus
  * the composable `zip_with`/`aggregate` formulation which walks the
  * array three times and allocates intermediates.
  *
  * Accumulation order matches VectorOps.cosineSim exactly (left-to-right
  * double sums, `dot / (sqrt(norm) * qnorm)`), so results are bit-equal
  * and interchangeable with the HOF path (and the DuckDB oracle).
  *
  * Degenerate inputs (zero-norm vector, NaN elements, zero-norm query)
  * yield NULL — the same contract as [[CosinePair]], for the same
  * reason: a raw NaN would rank FIRST under every `desc` retrieval
  * window and pass every threshold (Spark compares NaN greater than
  * everything), and `round(...).cast("long")` quantization of it
  * throws under ANSI. NULL fails filters, sorts nulls-last, and
  * quantizes to null.
  */
case class CosineToQuery(child: Expression, query: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private val qNorm: Double = math.sqrt(query.map(x => x * x).sum)

  @transient private lazy val elementIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_to_query needs array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), query.length)
    var dot = 0.0
    var nv = 0.0
    var i = 0
    if (elementIsFloat) {
      while (i < n) {
        val v = arr.getFloat(i).toDouble
        dot += v * query(i); nv += v * v; i += 1
      }
    } else {
      while (i < n) {
        val v = arr.getDouble(i)
        dot += v * query(i); nv += v * v; i += 1
      }
    }
    val r = dot / (math.sqrt(nv) * qNorm)
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the query vector once per operator as a reference object
    val qRef = ctx.addReferenceObj("query", query, "double[]")
    val getter = if (elementIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val dot = ctx.freshName("dot"); val nv = ctx.freshName("nv")
      val i = ctx.freshName("i"); val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |double $dot = 0.0; double $nv = 0.0;
         |int $n = java.lang.Math.min($arr.numElements(), $qRef.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $arr.$getter($i);
         |  $dot += $v * $qRef[$i];
         |  $nv += $v * $v;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nv) * ${qNorm}D);
         |if (java.lang.Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CosineToQuery =
    copy(child = newChild)
}

object CosineToQuery {
  /** Column-level entry point. */
  def apply(vec: Column, query: Seq[Double]): Column =
    toColumn(CosineToQuery(toExpression(vec), query.toArray))
}
