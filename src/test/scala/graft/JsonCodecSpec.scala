package graft

import graft.ast._
import graft.ast.PropertyValue._
import graft.ast.Json

/** Wire-format tests: the scaffolded reference example must parse
  * (helix-cli/src/commands/init.rs:191-207), and every AST shape must
  * survive a render -> parse round-trip.
  */
class JsonCodecSpec extends GraftSuite {

  test("parses the reference's scaffolded example request") {
    val json = """{"request_type":"read","query":{"queries":[{"Query":{"name":"node_count",
      "steps":[{"NWhere":{"Eq":["$label",{"String":"User"}]}},"Count"],"condition":null}}],
      "returns":["node_count"]},"parameters":{}}"""
    val req = Json.parseRequest(json)
    assert(!req.batch.write)
    assert(req.batch.returns == Seq("node_count"))
    val BatchEntry.Query(q) = req.batch.entries.head
    assert(q.name.contains("node_count"))
    assert(q.traversal.steps == Vector(
      Step.NWhere(Predicate.Eq("$label", VString("User"))), Step.Count))
  }

  test("parses an AddN write request (e2e_runtime.rs:106-114 shape)") {
    val json = """{"request_type":"write","query_name":null,"query":{"queries":[{"Query":{
      "name":"created","steps":[{"AddN":{"label":"E2EUser","properties":[
      ["externalId",{"Value":{"String":"cli-e2e"}}],
      ["name",{"Expr":{"Param":"who"}}]]}}],"condition":null}}],
      "returns":["created"]},"parameters":{"who":"CI User"}}"""
    val req = Json.parseRequest(json)
    assert(req.batch.write)
    assert(req.parameters("who") == VString("CI User"))
    val BatchEntry.Query(q) = req.batch.entries.head
    assert(q.traversal.steps.head == Step.AddN("E2EUser", Seq(
      "externalId" -> PropertyInput.Value(VString("cli-e2e")),
      "name" -> PropertyInput.FromExpr(Expr.Param("who")))))
  }

  test("round-trips every step family") {
    val steps: Vector[Step] = Vector(
      Step.N(NodeRef.All), Step.N(NodeRef.Ids(Seq(1L, 2L))), Step.N(NodeRef.Var("v")),
      Step.NWhere(Predicate.And(Seq(
        Predicate.Eq("$label", VString("User")),
        Predicate.Between("age", VI64(1), VI64(9)),
        Predicate.BetweenExpr("x", Expr.Constant(VI64(1)), Expr.Param("p")),
        Predicate.IsIn("s", Seq(VString("a"), VString("b"))),
        Predicate.Not(Predicate.StartsWith("n", "A")),
        Predicate.Compare(Expr.Mul(Expr.Property("a"), Expr.Constant(VF64(2.0))),
          CompareOp.Gte, Expr.Neg(Expr.Property("b")))))),
      Step.E(EdgeRef.All), Step.EWhere(Predicate.HasKey("w")),
      Step.VectorSearchNodes("L", "emb", Some(PropertyInput.Value(VString("t"))),
        PropertyInput.Value(VF32Array(Seq(1f, 2f))), StreamBound.Literal(5)),
      Step.TextSearchNodes("L", "txt", None,
        PropertyInput.FromExpr(Expr.Param("q")), StreamBound.FromExpr(Expr.Param("k"))),
      Step.Inject("v"),
      Step.Out(Some("KNOWS")), Step.In(None), Step.Both(Some("X")),
      Step.OutE(None), Step.InE(Some("Y")), Step.BothE(None),
      Step.OutN, Step.InN, Step.OtherN,
      Step.Has("name", VString("Alice")), Step.HasLabel("User"), Step.HasKey("email"),
      Step.Where(Predicate.IsNull("x")), Step.Dedup,
      Step.Within("a"), Step.Without("b"),
      Step.EdgeHas("w", PropertyInput.Value(VI64(1))), Step.EdgeHasLabel("K"),
      Step.OrderBy("age", SortOrder.Desc),
      Step.OrderByMultiple(Seq(("a", SortOrder.Asc), ("b", SortOrder.Desc))),
      Step.Limit(10), Step.Skip(5), Step.Range(2, 7),
      Step.LimitBy(Expr.Param("n")), Step.SkipBy(Expr.Constant(VI64(1))),
      Step.RangeBy(StreamBound.Literal(0), StreamBound.FromExpr(Expr.Param("hi"))),
      Step.Group("city"), Step.GroupCount("status"),
      Step.AggregateBy(AggFn.Mean, "score"), Step.Fold, Step.Unfold,
      Step.Count, Step.Exists, Step.Id, Step.Label,
      Step.Values(Seq("a", "b")), Step.ValueMap(None), Step.ValueMap(Some(Seq("a"))),
      Step.Project(Seq(
        Projection.Property("a", "x"),
        Projection.FromEndpoint("name", "src_name"),
        Projection.ToEndpoint("name", "dst_name"),
        Projection.Computed("c", Expr.Case(
          Seq(Predicate.Gt("a", VI64(0)) -> Expr.Constant(VString("pos"))),
          Some(Expr.Constant(VString("neg"))))))),
      Step.ProjectBindings(Seq(
        BindingProjection.Property(BindingTarget.Binding("svc"), "name", "n"),
        BindingProjection.Coalesce(Seq(
          (BindingTarget.Current, "a"), (BindingTarget.Binding("b"), "c")), "al")),
        distinct = true),
      Step.EdgeProperties,
      Step.As("x"), Step.StoreVar("y"), Step.SelectVar("x"), Step.Bind("row"),
      Step.Union(Seq(Traversal(Vector(Step.Out(None))), Traversal(Vector(Step.In(None))))),
      Step.Choose(Predicate.Eq("s", VString("a")),
        Traversal(Vector(Step.Out(None))), Some(Traversal(Vector(Step.Count)))),
      Step.Coalesce(Seq(Traversal(Vector(Step.Out(None))), Traversal.empty)),
      Step.Optional(Traversal(Vector(Step.Out(Some("K"))))),
      Step.Repeat(RepeatConfig(Traversal(Vector(Step.Out(None))),
        times = Some(3), until = Some(Predicate.Eq("$label", VString("X"))),
        emit = EmitBehavior.All,
        emitPredicate = Some(Predicate.Gt("age", VI64(1))), maxDepth = 7)),
      Step.Path, Step.SimplePath, Step.WithSack(VF64(1.5)),
      Step.SackSet("p"), Step.SackAdd("q"), Step.SackGet,
      Step.AddN("User", Seq("n" -> PropertyInput.Value(VObject(Map(
        "nested" -> VArray(Seq(VI64(1), VString("x"), VNull))))))),
      Step.AddE("K", NodeRef.Param("tgt"), Seq("w" -> PropertyInput.Value(VDateTime(123456789L)))),
      Step.SetProperty("a", PropertyInput.FromExpr(Expr.Add(
        Expr.Property("a"), Expr.Constant(VI64(1))))),
      Step.RemoveProperty("b"), Step.Drop,
      Step.DropEdge(NodeRef.Ids(Seq(9L))),
      Step.DropEdgeLabeled(NodeRef.Var("t"), "K"),
      Step.DropEdgeById(EdgeRef.Ids(Seq(7L))),
      Step.CreateIndex(IndexSpec.NodeEquality("U", "email", unique = true), ifNotExists = true),
      Step.CreateIndex(IndexSpec.NodeRange("U", "age", descending = true), ifNotExists = false),
      Step.DropIndex(IndexSpec.EdgeRange("K", "w")),
      Step.CreateVectorIndexNodes("U", "emb", Some("tenantId")),
      Step.CreateTextIndexEdges("K", "note", None),
    )
    steps.foreach { st =>
      val json = Json.writeStep(st).toString
      val back = Json.readStep(new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))
      assert(back == st, s"round-trip mismatch for $st via $json")
    }
  }

  test("round-trips all PropertyValue variants") {
    val vals: Seq[PropertyValue] = Seq(VNull, VBool(true), VI64(Long.MaxValue),
      VDateTime(1700000000000L), VF64(3.25), VF32(1.5f), VString("héllo"),
      VI64Array(Seq(1L, 2L)), VF64Array(Seq(0.5)), VF32Array(Seq(2f)),
      VStringArray(Seq("a")), VArray(Seq(VI64(1), VNull)),
      VObject(Map("k" -> VString("v"), "n" -> VObject(Map("x" -> VI64(1))))))
    vals.foreach { v =>
      val back = Json.readValue(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Json.writeValue(v).toString))
      assert(back == v)
    }
  }

  test("full request round-trip incl. foreach and conditions") {
    val req = Json.Request(write = true, queryName = Some("seed"),
      batch = Batch(Seq(
        BatchEntry.ForEach("items", Seq(
          BatchEntry.Query(NamedQuery(Some("q1"),
            Traversal(Vector(Step.AddN("T", Seq("v" -> PropertyInput.FromExpr(Expr.Param("v")))))),
            Some(BatchCondition.PrevNotEmpty))))),
        BatchEntry.Query(NamedQuery(None, Traversal(Vector(Step.N(NodeRef.All), Step.Count)),
          Some(BatchCondition.VarMinSize("q1", 2)))),
      ), returns = Seq("q1"), write = true),
      parameters = Map("items" -> VArray(Seq(VObject(Map("v" -> VI64(1)))))))
    val parsed = Json.parseRequest(Json.writeRequest(req))
    assert(parsed.batch == req.batch)
    assert(parsed.write == req.write)
    assert(parsed.parameters == req.parameters)
  }

  test("parameter coercion: DateTime RFC3339, F32") {
    val json = """{"request_type":"read","query":{"queries":[],"returns":[]},
      "parameters":{"ts":"2024-06-01T12:30:00Z","f":1.5},
      "parameter_types":{"ts":"DateTime","f":"F32"}}"""
    val req = Json.parseRequest(json)
    assert(req.parameters("ts") == VDateTime(
      java.time.OffsetDateTime.parse("2024-06-01T12:30:00Z").toInstant.toEpochMilli))
    assert(req.parameters("f") == VF32(1.5f))
  }

  test("Bytes parameter type is rejected on the dynamic JSON route") {
    val json = """{"request_type":"read","query":{"queries":[],"returns":[]},
      "parameters":{"b":"AAEC"},
      "parameter_types":{"b":"Bytes"}}"""
    val e = intercept[IllegalArgumentException] { Json.parseRequest(json) }
    assert(e.getMessage.contains("Bytes"))
  }
}
