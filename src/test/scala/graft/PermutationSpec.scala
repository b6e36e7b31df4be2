package graft

import org.apache.spark.sql.functions._

import graft.ast._
import graft.ast.PropertyValue._
import graft.dsl.Dsl._
import graft.dsl.Tr

/** Permutation matrix in the spirit of the reference's generated parity
  * fixtures 100-291 (SURVEY §5.1: source {label, where, all} × filter
  * {none, has, logic, expr} × bound {none, limit, skip, range} ×
  * terminal {count, exists, value_map, project} — 192 combinations).
  *
  * Expected values are computed through an INDEPENDENT code path: plain
  * DataFrame algebra over the raw user table, not the traversal
  * compiler.
  */
class PermutationSpec extends GraftSuite {

  private lazy val store = TestBase.parityGraph()
  private lazy val users = store.nodesFor("ParityUser")
    .select("_id", "name", "age", "score", "status", "city").cache()

  // (name, traversal source, independent expected frame)
  private lazy val sources = Seq(
    ("all", g().n(), users),
    ("label", g().nWithLabel("ParityUser"), users),
    ("where", g().nWhere(Predicate.Gt("age", VI64(30))), users.where(col("age") > 30)),
  )

  private lazy val filters = Seq(
    ("none", identity[Tr] _, identity[org.apache.spark.sql.DataFrame] _),
    ("has", (t: Tr) => t.has("status", "active"),
      (d: org.apache.spark.sql.DataFrame) => d.where(col("status") === "active")),
    ("logic", (t: Tr) => t.where(or(eq_("city", "London"), gt("score", 70.0))),
      (d: org.apache.spark.sql.DataFrame) =>
        d.where(col("city") === "London" || col("score") > 70.0)),
    ("expr", (t: Tr) => t.where(Predicate.Compare(
        Expr.Add(prop("age"), lit_(10L)), CompareOp.Lt, prop("score"))),
      (d: org.apache.spark.sql.DataFrame) => d.where(col("age") + 10 < col("score"))),
  )

  // bounds apply after a deterministic order (age asc, id tiebreak)
  private lazy val bounds = Seq(
    ("none", identity[Tr] _, identity[org.apache.spark.sql.DataFrame] _),
    ("limit", (t: Tr) => t.orderBy("age").limit(2),
      (d: org.apache.spark.sql.DataFrame) => d.orderBy(col("age"), col("_id")).limit(2)),
    ("skip", (t: Tr) => t.orderBy("age").skip(1),
      (d: org.apache.spark.sql.DataFrame) => d.orderBy(col("age"), col("_id")).offset(1)),
    ("range", (t: Tr) => t.orderBy("age").range(1, 3),
      (d: org.apache.spark.sql.DataFrame) =>
        d.orderBy(col("age"), col("_id")).offset(1).limit(2)),
  )

  private def runT(t: Tr) = TestBase.compiler(store).run(t.t)

  for ((sn, src, sExp) <- sources; (fn, f, fExp) <- filters; (bn, b, bExp) <- bounds) {
    val base = s"$sn-$fn-$bn"
    lazy val expected = bExp(fExp(sExp))

    test(s"perm $base count") {
      assert(singleLong(runT(b(f(src)).count())) == expected.count())
    }
    test(s"perm $base exists") {
      assert(runT(b(f(src)).exists()).collect()(0).getBoolean(0) ==
        !expected.isEmpty)
    }
    test(s"perm $base value_map") {
      val got = runT(b(f(src)).valueMap("name", "city")).collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      val want = expected.select("name", "city").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(got == want)
    }
    test(s"perm $base project") {
      val got = runT(b(f(src)).project(
        Projection.Property("name", "who"),
        Projection.Computed("double_age", Expr.Mul(prop("age"), lit_(2L)))))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      val want = expected.select(col("name"), (col("age") * 2).as("a")).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(got == want)
    }
  }
}
