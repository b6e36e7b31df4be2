package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Native Catalyst expression: index of the nearest centroid (squared
  * L2 distance, first-min tie-break) for an array column.
  *
  * The centroid matrix is carried as ONE reference object (a flattened
  * `double[]` shipped via `ctx.addReferenceObj`), so the generated code
  * is a fixed ~20-line double loop regardless of `nlist` — unlike the
  * literal-array formulation (`array(dist_0, …, dist_nlist)` with a
  * `dim`-element literal per centroid), which at nlist=4096 × dim=64
  * builds a ~260k-node expression tree that blows past Janino's 64KB
  * method limit and falls back to interpreted evaluation. This is the
  * kernel behind IVF assignment (the analogue of the reference's HNSW
  * insert-time graph construction, helix-cli/src/config.rs:191-201),
  * so it must survive nlist=4096 at 100 TB.
  *
  * Semantics match the previous `zip_with`/`array_min`/`array_position`
  * formulation bit-for-bit: per-centroid distance is a left-to-right
  * double sum of (x - y)^2 over min(vector length, dim) elements, and
  * ties resolve to the FIRST minimal centroid (strict `<` update ==
  * `array_position` of the min).
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private val nlist: Int = cents.length
  private val dim: Int = if (cents.isEmpty) 0 else cents(0).length

  /** Row-major flattened centroid matrix — one JVM object referenced by
    * both the interpreted and generated paths.
    */
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](nlist * dim)
    var c = 0
    while (c < nlist) {
      System.arraycopy(cents(c), 0, f, c * dim, dim)
      c += 1
    }
    f
  }

  @transient private lazy val elementIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) if nlist > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid needs array<float|double> and >=1 centroid, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < nlist) {
      val base = c * dim
      var d = 0.0
      var i = 0
      if (elementIsFloat) {
        while (i < n) { val v = arr.getFloat(i).toDouble - flat(base + i); d += v * v; i += 1 }
      } else {
        while (i < n) { val v = arr.getDouble(i) - flat(base + i); d += v * v; i += 1 }
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val getter = if (elementIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val v = ctx.freshName("v"); val base = ctx.freshName("base")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |int $best = 0; double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $nlist; $c++) {
         |  int $base = $c * $dim;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = ((double) $arr.$getter($i)) - $fRef[$base + $i];
         |    $d += $v * $v;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column-level entry point. */
  def apply(vec: Column, cents: Array[Array[Double]]): Column =
    toColumn(NearestCentroid(toExpression(vec), cents))
}
