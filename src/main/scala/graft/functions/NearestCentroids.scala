package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Native Catalyst expression: indices of the `nprobe` nearest
  * centroids (squared L2, ascending distance; equal distances keep the
  * lower centroid index first) for an array column — the multi-probe
  * companion of [[NearestCentroid]], behind the fully-distributed
  * k-NN join (each query row fans out to its probed clusters as an
  * equi-join key; no driver-side query collect).
  *
  * Same engineering as [[NearestCentroid]]: the centroid matrix rides
  * as ONE flattened `double[]` reference object, so generated code
  * stays a fixed-size loop at any nlist; selection is an insertion
  * into nprobe-sized parallel arrays (nprobe is small — probing is
  * pointless past ~nlist/2), O(nlist * nprobe) per row.
  */
case class NearestCentroids(child: Expression, cents: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroids"

  private val nlist: Int = cents.length
  private val dim: Int = if (cents.isEmpty) 0 else cents(0).length
  private val np: Int = math.min(nprobe, nlist)

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
      case ArrayType(FloatType | DoubleType, _) if nlist > 0 && nprobe > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids needs array<float|double>, >=1 centroid and nprobe >= 1, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val bestD = Array.fill(np)(Double.PositiveInfinity)
    val bestI = new Array[Int](np)
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
      // strict < : at equal distance the earlier (lower) index stays
      if (d < bestD(np - 1)) {
        var j = np - 1
        while (j > 0 && d < bestD(j - 1)) {
          bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
        }
        bestD(j) = d; bestI(j) = c
      }
      c += 1
    }
    ArrayData.toArrayData(bestI)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val getter = if (elementIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val v = ctx.freshName("v"); val base = ctx.freshName("base")
      val bd = ctx.freshName("bd"); val bi = ctx.freshName("bi")
      val j = ctx.freshName("j"); val outArr = ctx.freshName("outArr")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |double[] $bd = new double[$np];
         |int[] $bi = new int[$np];
         |java.util.Arrays.fill($bd, Double.POSITIVE_INFINITY);
         |for (int $c = 0; $c < $nlist; $c++) {
         |  int $base = $c * $dim;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = ((double) $arr.$getter($i)) - $fRef[$base + $i];
         |    $d += $v * $v;
         |  }
         |  if ($d < $bd[$np - 1]) {
         |    int $j = $np - 1;
         |    while ($j > 0 && $d < $bd[$j - 1]) {
         |      $bd[$j] = $bd[$j - 1]; $bi[$j] = $bi[$j - 1]; $j--;
         |    }
         |    $bd[$j] = $d; $bi[$j] = $c;
         |  }
         |}
         |int[] $outArr = new int[$np];
         |System.arraycopy($bi, 0, $outArr, 0, $np);
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($outArr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroids {
  def apply(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    toColumn(NearestCentroids(toExpression(vec), cents, nprobe))
}
