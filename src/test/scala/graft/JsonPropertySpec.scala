package graft

import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

import graft.ast._
import graft.ast.PropertyValue._
import graft.ast.Json

/** Property-based wire-format checks: arbitrary AST trees must survive
  * render -> parse unchanged.
  */
class JsonPropertySpec extends AnyFunSuite {

  /** Deterministic sampling harness (no scalatest-scalacheck bridge in
    * the offline cache): draw N samples from a Gen with fixed seeds.
    */
  private def forAllSampled[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (0 until n).foreach { i =>
      gen.apply(params, org.scalacheck.rng.Seed(i.toLong)).foreach(check)
    }
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  val genScalar: Gen[PropertyValue] = Gen.oneOf(
    Gen.const(VNull),
    Gen.oneOf(true, false).map(VBool),
    Arbitrary.arbitrary[Long].map(VI64),
    Arbitrary.arbitrary[Long].map(VDateTime),
    Gen.chooseNum(-1e9, 1e9).map(VF64),
    Gen.alphaNumStr.map(VString),
  )

  def genValue(depth: Int): Gen[PropertyValue] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      6 -> genScalar,
      1 -> Gen.listOfN(3, Arbitrary.arbitrary[Long]).map(VI64Array),
      1 -> Gen.listOfN(3, Gen.alphaNumStr).map(VStringArray),
      1 -> Gen.listOfN(2, genValue(depth - 1)).map(VArray),
      1 -> Gen.mapOfN(2, Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty),
        genValue(depth - 1))).map(VObject),
    )

  def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) Gen.oneOf(
      Gen.alphaNumStr.map(Expr.Property), Gen.const(Expr.Id),
      genScalar.map(Expr.Constant), Gen.alphaNumStr.map(Expr.Param))
    else Gen.oneOf(
      Gen.alphaNumStr.map(Expr.Property),
      genScalar.map(Expr.Constant),
      Gen.zip(genExpr(depth - 1), genExpr(depth - 1)).map { case (a, b) => Expr.Add(a, b) },
      Gen.zip(genExpr(depth - 1), genExpr(depth - 1)).map { case (a, b) => Expr.Mul(a, b) },
      genExpr(depth - 1).map(Expr.Neg),
    )

  def genPred(depth: Int): Gen[Predicate] =
    if (depth <= 0) Gen.oneOf(
      Gen.zip(Gen.alphaNumStr, genScalar).map { case (p, v) => Predicate.Eq(p, v) },
      Gen.alphaNumStr.map(Predicate.HasKey),
      Gen.alphaNumStr.map(Predicate.IsNull),
      Gen.zip(Gen.alphaNumStr, Gen.alphaNumStr).map { case (p, s) => Predicate.StartsWith(p, s) })
    else Gen.oneOf(
      Gen.zip(Gen.alphaNumStr, genScalar).map { case (p, v) => Predicate.Gt(p, v) },
      Gen.listOfN(2, genPred(depth - 1)).map(Predicate.And),
      Gen.listOfN(2, genPred(depth - 1)).map(Predicate.Or),
      genPred(depth - 1).map(Predicate.Not),
      Gen.zip(genExpr(depth - 1), genExpr(depth - 1)).map { case (l, r) =>
        Predicate.Compare(l, CompareOp.Lte, r) },
    )

  val genStep: Gen[Step] = Gen.oneOf(
    genPred(2).map(Step.NWhere),
    genPred(2).map(Step.Where),
    Gen.option(Gen.alphaNumStr).map(Step.Out),
    Gen.zip(Gen.alphaNumStr, genValue(2)).map { case (p, v) => Step.Has(p, v) },
    Gen.chooseNum(0L, 1000L).map(Step.Limit),
    Gen.alphaNumStr.map(Step.GroupCount),
    Gen.const(Step.Count),
    Gen.listOfN(2, Gen.alphaNumStr).map(Step.Values),
    genPred(1).map(p => Step.Choose(p,
      Traversal(Vector(Step.Out(None))), None)),
    Gen.zip(genValue(1), Gen.alphaNumStr).map { case (v, l) =>
      Step.AddN(l, Seq("p" -> PropertyInput.Value(v))) },
  )

  private def roundTripValue(v: PropertyValue): PropertyValue =
    Json.readValue(mapper.readTree(Json.writeValue(v).toString))
  private def roundTripStep(s: Step): Step =
    Json.readStep(mapper.readTree(Json.writeStep(s).toString))

  test("PropertyValue round-trips for arbitrary nested values") {
    forAllSampled(genValue(3)) { v => assert(roundTripValue(v) == v) }
  }

  test("Predicate round-trips for arbitrary trees") {
    forAllSampled(genPred(3)) { p =>
      assert(Json.readPred(mapper.readTree(Json.writePred(p).toString)) == p)
    }
  }

  test("Step round-trips for arbitrary steps") {
    forAllSampled(genStep) { s => assert(roundTripStep(s) == s) }
  }
}
