package graft

import graft.ast._
import graft.ast.PropertyValue._
import graft.dsl.Dsl._

/** Per-operator unit tests on the tiny parity graph (SURVEY §2). */
class CompilerSpec extends GraftSuite {
  private def c = TestBase.compiler()

  // ---- sources & filters
  test("N all + count") {
    assert(singleLong(c.run(g().n().count().t)) == 3)
  }
  test("N by ids") {
    assert(ids(c.run(g().n(1L, 3L).id().t)) == Seq(1L, 3L))
  }
  test("NWhere with label pin prunes and filters") {
    assert(singleLong(c.run(
      g().nWithLabelWhere("ParityUser", eq_("status", "active")).count().t)) == 2)
  }
  test("has / hasLabel / hasKey") {
    assert(singleLong(c.run(g().n().has("name", "Alice").count().t)) == 1)
    assert(singleLong(c.run(g().n().hasLabel("ParityUser").count().t)) == 3)
    assert(singleLong(c.run(g().n().hasKey("city").count().t)) == 3)
    assert(singleLong(c.run(g().n().hasKey("missing").count().t)) == 0)
  }
  test("predicates: between, startsWith, contains, isin, not, compare") {
    assert(singleLong(c.run(g().n()
      .where(between("age", VI64(27), VI64(31))).count().t)) == 2)
    assert(singleLong(c.run(g().n().where(startsWith("name", "A")).count().t)) == 1)
    assert(singleLong(c.run(g().n().where(containsStr("city", "er")).count().t)) == 1)
    assert(singleLong(c.run(g().n()
      .where(isIn("city", VString("London"), VString("Paris"))).count().t)) == 2)
    assert(singleLong(c.run(g().n().where(not(eq_("status", "active"))).count().t)) == 1)
    // property-to-property arithmetic: age * 2 > score — only Carol (84 > 64)
    assert(singleLong(c.run(g().n().where(Predicate.Compare(
      Expr.Mul(prop("age"), lit_(2L)), CompareOp.Gt, prop("score"))).count().t)) == 1)
  }
  test("isIn compiles to one In predicate, not an OR chain") {
    // 1000-element membership list: must stay a single pushdown-friendly
    // In/InSet node — the old ===-OR chain built a 1000-deep boolean
    // tree that defeated predicate pushdown and strained codegen
    val vs = (0 until 1000).map(i => VString(s"city$i")) :+ VString("Paris")
    val df = c.run(g().n().where(isIn("city", vs: _*)).t)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains(" OR "), s"OR chain leaked into plan:\n$plan")
    assert(plan.toLowerCase.contains("in"), s"no In predicate in plan:\n$plan")
    assert(df.count() == 1) // only Bob's Paris matches
  }
  test("isNull vs isNotNull vs missing column") {
    assert(singleLong(c.run(g().n().where(Predicate.IsNull("nope")).count().t)) == 3)
    assert(singleLong(c.run(g().n().where(Predicate.IsNotNull("name")).count().t)) == 3)
  }
  test("where with param expr") {
    val comp = TestBase.compiler(params = Map("minAge" -> VI64(30)))
    assert(singleLong(comp.run(
      g().n().where(Predicate.GteExpr("age", Expr.Param("minAge"))).count().t)) == 2)
  }

  // ---- navigation
  test("out / in / both") {
    assert(ids(c.run(g().n(1L).out("FOLLOWS").id().t)) == Seq(2L))
    assert(ids(c.run(g().n(3L).in("FOLLOWS").id().t)) == Seq(2L))
    assert(ids(c.run(g().n(2L).both("FOLLOWS").id().t)) == Seq(1L, 3L))
  }
  test("outE / inN / outN / otherN") {
    val e = c.run(g().n(1L).outE("FOLLOWS").values("weight").t)
    assert(rows(e) == Seq(Seq(1.0)))
    assert(ids(c.run(g().eWithLabel("FOLLOWS").outN().id().t)) == Seq(2L, 3L))
    assert(ids(c.run(g().eWithLabel("FOLLOWS").inN().id().t)) == Seq(1L, 2L))
    // arrive at edge from node 2 in both directions; other end is 1 and 3
    assert(ids(c.run(g().n(2L).bothE("FOLLOWS").otherN().id().t)) == Seq(1L, 3L))
  }
  test("edge filters") {
    assert(singleLong(c.run(
      g().eWithLabel("FOLLOWS").edgeHas("weight", VF64(1.0)).count().t)) == 1)
    assert(singleLong(c.run(
      g().e().edgeHasLabel("FOLLOWS").count().t)) == 2)
    assert(singleLong(c.run(
      g().eWithLabelWhere("FOLLOWS", gt("weight", 0.6)).count().t)) == 1)
  }

  // ---- dedup / variables
  test("dedup removes duplicate traversers") {
    // both alice and bob flow to an out() — bob's target carol, alice's bob
    val dup = c.run(g().n(1L, 2L).out("FOLLOWS").out("FOLLOWS").id().t)
    assert(ids(dup) == Seq(3L)) // only bob->carol continues
  }
  test("within / without via batch vars") {
    val comp = TestBase.compiler()
    comp.batchVars("actives") =
      comp.evalToStream(g().nWithLabelWhere("ParityUser", eq_("status", "active")).t)
    assert(singleLong(comp.run(g().n().within("actives").count().t)) == 2)
    assert(singleLong(comp.run(g().n().without("actives").count().t)) == 1)
  }
  test("as + select restores a stored stream") {
    val out = c.run(g().n(1L).as("start").out("FOLLOWS").select("start").id().t)
    assert(ids(out) == Seq(1L))
  }
  test("inject merges var into stream with dedup") {
    val comp = TestBase.compiler()
    comp.batchVars("alice") = comp.evalToStream(g().n(1L).t)
    assert(singleLong(comp.run(g().n(1L, 2L).inject("alice").count().t)) == 2)
  }

  // ---- sorts / paging
  test("orderBy + limit + range") {
    val top = c.run(g().n().orderBy("age", SortOrder.Desc).limit(2).values("name").t)
    assert(rows(top).map(_.head) == Seq("Carol", "Alice"))
    val page = c.run(g().n().orderBy("age", SortOrder.Asc).range(1, 3).values("name").t)
    assert(rows(page).map(_.head) == Seq("Alice", "Carol"))
  }
  test("orderByMultiple") {
    val r = c.run(g().n()
      .orderByMultiple(("status", SortOrder.Asc), ("age", SortOrder.Desc))
      .values("name").t)
    assert(rows(r).map(_.head) == Seq("Alice", "Bob", "Carol"))
  }
  test("limitBy with param") {
    val comp = TestBase.compiler(params = Map("k" -> VI64(1)))
    assert(singleLong(comp.run(
      g().n().limitBy(Expr.Param("k")).count().t)) == 1)
  }

  // ---- aggregations
  test("groupCount / group / aggregateBy") {
    val gc = c.run(g().n().groupCount("status").t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gc == Map("active" -> 2, "inactive" -> 1))
    val grp = c.run(g().n().group("status").t).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(grp("active") == Seq(1L, 2L))
    assert(c.run(g().n().aggregateBy(AggFn.Sum, "age").t).collect()(0).getLong(0) == 100L)
    assert(c.run(g().n().aggregateBy(AggFn.Mean, "score").t)
      .collect()(0).getDouble(0) === (90.5 + 72.25 + 64.0) / 3)
    assert(c.run(g().n().aggregateBy(AggFn.Min, "age").t).collect()(0).getLong(0) == 27L)
    assert(c.run(g().n().aggregateBy(AggFn.Max, "age").t).collect()(0).getLong(0) == 42L)
    assert(c.run(g().n().aggregateBy(AggFn.Count, "age").t).collect()(0).getLong(0) == 3L)
  }
  test("fold/unfold are accepted no-ops") {
    assert(singleLong(c.run(g().n().fold().unfold().count().t)) == 3)
  }

  // ---- terminals
  test("exists / id / label / values / valueMap") {
    assert(c.run(g().n().has("name", "Zed").exists().t).collect()(0).getBoolean(0) == false)
    assert(c.run(g().n(2L).label().t).collect()(0).getString(0) == "ParityUser")
    assert(rows(c.run(g().n(1L).values("name", "$id").t)) == Seq(Seq("Alice", 1L)))
    val vm = c.run(g().n(1L).valueMap("name", "city").t)
    assert(vm.columns.toSeq == Seq("name", "city"))
  }
  test("project with alias, case expression and endpoint pulls") {
    val p = c.run(g().n(1L).project(
      Projection.Property("name", "who"),
      Projection.Computed("ageClass", Expr.Case(
        Seq(Predicate.Lt("age", VI64(30)) -> Expr.Constant(VString("young"))),
        Some(Expr.Constant(VString("old")))))).t)
    assert(rows(p) == Seq(Seq("Alice", "old")))
    val ep = c.run(g().n(1L).outE("FOLLOWS").project(
      Projection.FromEndpoint("name", "from_name"),
      Projection.ToEndpoint("name", "to_name"),
      Projection.Property("weight", "w")).t)
    assert(rows(ep) == Seq(Seq("Alice", "Bob", 1.0)))
  }
  test("edgeProperties") {
    val ep = c.run(g().n(1L).outE("FOLLOWS").edgeProperties().t)
    assert(ep.columns.toSeq.sorted == Seq("embedding", "note", "since", "weight"))
  }

  test("repeat pins until+times combined semantics") {
    // our documented choice (no public fixture pins this corner): the
    // loop runs at most `times` iterations; elements satisfying `until`
    // exit as results at whatever depth they reach it; the final
    // frontier joins them. From node 1: depth1 = {2}, until($id==2)
    // fires -> {2} exits; frontier empty -> loop ends early.
    val r = c.run(g().n(1L).repeat(RepeatConfig(sub().out("FOLLOWS").t,
      times = Some(5), until = Some(eq_("$id", 2L)))).id().t)
    assert(ids(r) == Seq(2L))
    // times caps depth even when until never fires: 1 -(2 hops)-> 3
    val r2 = c.run(g().n(1L).repeat(RepeatConfig(sub().out("FOLLOWS").t,
      times = Some(2), until = Some(eq_("name", "Nobody")))).id().t)
    assert(ids(r2) == Seq(3L))
  }

  test("repeat: remaining RepeatConfig shapes — Before/After/emit_if/depth clamp") {
    // Before (dsl.rs:2550-2554): the frontier is emitted at each
    // iteration START, and the result is the emit stream — the
    // post-loop frontier is not appended. (Unobservable in the public
    // fixtures — 017 only exercises emit_all — so this pins OUR
    // documented choice.) From 1: iter1 emits {1}, iter2 emits {2}.
    val before = c.run(g().n(1L).repeat(RepeatConfig(sub().out("FOLLOWS").t,
      times = Some(2), emit = EmitBehavior.Before)).id().t)
    assert(ids(before) == Seq(1L, 2L))
    // After (dsl.rs:2556-2560): each post-hop frontier, final included
    val after = c.run(g().n(1L).repeat(RepeatConfig(sub().out("FOLLOWS").t,
      times = Some(2), emit = EmitBehavior.After)).id().t)
    assert(ids(after) == Seq(2L, 3L))
    // emit_if = After + predicate (dsl.rs:2562-2570): Bob(27) filtered
    val emitIf = c.run(g().n(1L).repeat(RepeatConfig(sub().out("FOLLOWS").t,
      times = Some(2), emit = EmitBehavior.After,
      emitPredicate = Some(gt("age", 30L)))).id().t)
    assert(ids(emitIf) == Seq(3L))
    // max_depth clamps times (dsl.rs:2572-2576; default 100)
    val clamped = c.run(g().n(1L).repeat(RepeatConfig(sub().out("FOLLOWS").t,
      times = Some(50), maxDepth = 1)).id().t)
    assert(ids(clamped) == Seq(2L))
  }

  test("repeat: the full wire RepeatConfig decodes and executes") {
    // every RepeatConfig field on the wire at once, in the reference's
    // serde layout (RepeatConfig, dsl.rs:2499-2516), decoded by the
    // JSON codec and run — times+until+emit+emit_predicate+max_depth
    val json = """{"Repeat":{"traversal":{"steps":[{"Out":"FOLLOWS"}]},
      "times":5,"until":{"Eq":["$id",{"I64":3}]},"emit":"All",
      "emit_predicate":{"Gt":["age",{"I64":20}]},"max_depth":4}}"""
    val step = graft.ast.Json.readStep(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))
    val expected = Step.Repeat(RepeatConfig(
      Traversal(Vector(Step.Out(Some("FOLLOWS")))),
      times = Some(5), until = Some(Predicate.Eq("$id", VI64(3))),
      emit = EmitBehavior.All,
      emitPredicate = Some(Predicate.Gt("age", VI64(20))), maxDepth = 4))
    assert(step == expected)
    // run it: emit-All emits {1} at depth 0 and each hop frontier;
    // until($id==3) exits Carol when reached; ids are the union
    val r = c.run(Traversal(Vector(
      Step.N(NodeRef.Ids(Seq(1L))), step, Step.Id)))
    assert(ids(r).distinct == Seq(1L, 2L, 3L))
  }

  // ---- bind / projectBindings
  test("bind captures row provenance through navigation") {
    val r = c.run(g().n(1L).bind("src").out("FOLLOWS").bind("dst")
      .projectBindings(
        BindingProjection.Property(BindingTarget.Binding("src"), "name", "src_name"),
        BindingProjection.Property(BindingTarget.Binding("dst"), "name", "dst_name"),
        BindingProjection.Property(BindingTarget.Current, "$id", "cur_id"),
        BindingProjection.Coalesce(
          Seq((BindingTarget.Binding("missing"), "name"),
            (BindingTarget.Binding("src"), "name")), "first_name")).t)
    assert(rows(r) == Seq(Seq("Alice", "Bob", 2L, "Alice")))
  }

  test("bind survives heterogeneous Union/Choose branches (fixtures 909/910)") {
    // two labels whose `age` property has CONFLICTING types (dynamic
    // property model): long on Person, string on Item — the binding
    // struct must widen the conflict to string across the union
    val s = spark
    import s.implicits._
    val people = Seq((1L, "Person", "Alice", 31L)).toDF("_id", "_label", "name", "age")
    val items = Seq((2L, "Item", "Widget", "old")).toDF("_id", "_label", "name", "age")
    val store = new graft.model.GraphStore(s,
      Map("Person" -> people, "Item" -> items), Map.empty, Map.empty)
    val comp = TestBase.compiler(store)
    val r = comp.run(g().n().union(
      sub().hasLabel("Person").bind("c"),
      sub().hasLabel("Item").bind("c"))
      .projectBindings(
        BindingProjection.Property(BindingTarget.Binding("c"), "name", "bname"),
        BindingProjection.Property(BindingTarget.Binding("c"), "age", "bage")).t)
    val got = rows(r).map(x => (x(0), x(1))).toSet
    assert(got == Set(("Alice", "31"), ("Widget", "old")))
  }

  // ---- control flow
  test("union merges branch results") {
    val r = c.run(g().n(2L).union(
      sub().out("FOLLOWS"), sub().in("FOLLOWS")).id().t)
    assert(ids(r) == Seq(1L, 3L))
  }
  test("choose routes per element") {
    val r = c.run(g().n().choose(eq_("status", "active"),
      sub().out("FOLLOWS")).id().t)
    // actives follow: 1->2, 2->3; carol (inactive) passes through
    assert(ids(r) == Seq(2L, 3L, 3L))
  }
  test("coalesce picks first non-empty branch per element") {
    val r = c.run(g().n().coalesceSteps(
      sub().out("FOLLOWS"), sub()).id().t)
    // alice,bob have out-neighbors; carol falls through to herself
    assert(ids(r) == Seq(2L, 3L, 3L))
  }
  test("optional passes through when branch is empty") {
    val r = c.run(g().n().optional(sub().out("FOLLOWS")).id().t)
    assert(ids(r) == Seq(2L, 3L, 3L))
  }
  test("repeat times=2") {
    assert(ids(c.run(g().n(1L).repeat(sub().out("FOLLOWS"), 2).id().t)) == Seq(3L))
  }
  test("repeat emit=All emits every depth") {
    val r = c.run(g().n(1L).repeat(RepeatConfig(sub().out("FOLLOWS").t,
      times = Some(2), emit = EmitBehavior.All)).id().t)
    assert(ids(r) == Seq(1L, 2L, 3L))
  }
  test("repeat until stops at predicate") {
    val r = c.run(g().n(1L).repeat(RepeatConfig(sub().out("FOLLOWS").t,
      until = Some(eq_("status", "inactive")), maxDepth = 10)).id().t)
    assert(ids(r) == Seq(3L))
  }
  test("repeat terminates on empty frontier under maxDepth") {
    val r = c.run(g().n(1L).repeat(RepeatConfig(sub().out("FOLLOWS").t,
      maxDepth = 50)).id().t)
    assert(ids(r) == Seq())
  }
  test("deep repeat with emit keeps the final plan bounded") {
    // 60 emitting depths used to build a 60-branch union plan; the
    // FoldWidth fold collapses the buffer into checkpointed prefixes so
    // the final plan's leaves stay O(FoldWidth) regardless of depth
    val r = c.run(g().n(1L).repeat(RepeatConfig(sub().out("FOLLOWS").t,
      times = Some(60), emit = EmitBehavior.All)).id().t)
    assert(ids(r) == Seq(1L, 2L, 3L)) // depths 0,1,2; deeper frontiers empty
    // each surviving branch holds a few scan leaves (node+edge tables),
    // so the bound is O(FoldWidth * leaves-per-branch) ≈ 3 dozen —
    // depth-independent; unfolded, 60 emitting depths exceed 150 leaves
    val leaves = r.queryExecution.optimizedPlan.collectLeaves().size
    assert(leaves <= 40, s"plan has $leaves leaves — emit union not folded")
  }
  test("reserved steps are no-ops") {
    assert(singleLong(c.run(Traversal(Vector(
      Step.N(NodeRef.All), Step.Path, Step.SimplePath,
      Step.WithSack(VI64(0)), Step.SackSet("x"), Step.SackAdd("x"), Step.SackGet,
      Step.Count)))) == 3)
  }

  // ---- search virtual fields
  test("vector search top-k with $distance projection") {
    val r = c.run(g().vectorSearchNodes("ParityUser", "embedding",
      Seq(1.0f, 0.05f, 0.0f), 2)
      .project(Projection.Property("name", "name"),
        Projection.Property("$distance", "score")).t).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("Alice", "Bob"))
    assert(r(0).getDouble(1) > r(1).getDouble(1))
  }
  test("text search ranks by bm25") {
    val r = c.run(g().textSearchNodes("ParityUser", "bio", "vector search", 2)
      .values("name").t)
    assert(rows(r).map(_.head).toSet == Set("Alice", "Bob"))
  }
  test("vector and text search over edges") {
    val v = c.run(g().vectorSearchEdges("FOLLOWS", "embedding",
      Seq(0.9f, 0.1f), 1).values("weight").t)
    assert(rows(v) == Seq(Seq(1.0)))
    val t = c.run(g().textSearchEdges("FOLLOWS", "note", "travel blog", 1)
      .outN().values("name").t)
    assert(rows(t) == Seq(Seq("Carol")))
  }

  test("vector search with tenant filter") {
    val r = c.run(Traversal(Vector(
      Step.VectorSearchNodes("ParityUser", "embedding",
        Some(PropertyInput.Value(VString("t2"))),
        PropertyInput.Value(VF32Array(Seq(1.0f, 0.0f, 0.0f))),
        StreamBound.Literal(5)),
      Step.Values(Seq("name")))))
    assert(rows(r).map(_.head) == Seq("Carol"))
  }
}
