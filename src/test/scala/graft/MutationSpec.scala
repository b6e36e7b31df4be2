package graft

import graft.ast._
import graft.ast.PropertyValue._
import graft.dsl.Dsl._
import graft.exec.BatchExecutor
import graft.model.GraphStore

/** Write-batch semantics (SURVEY §2.8): mutations, read-your-writes,
  * conditions, foreach.
  */
class MutationSpec extends GraftSuite {

  test("AddN creates a node and becomes the stream") {
    val comp = TestBase.compiler(write = true)
    val created = comp.run(g().addN("ParityUser",
      "name" -> VString("Dave"), "age" -> VI64(50)).values("name").t)
    assert(rows(created) == Seq(Seq("Dave")))
    assert(singleLong(comp.run(g().nWithLabel("ParityUser").count().t)) == 4)
  }

  test("AddN bootstraps an empty store") {
    val comp = new graft.exec.Compiler(new GraphStore(spark),
      writeEnabled = true)
    comp.run(g().addN("Doc", "title" -> VString("hello")).t)
    assert(singleLong(comp.run(g().nWithLabel("Doc").count().t)) == 1)
  }

  test("AddE links current nodes to target ref") {
    val comp = TestBase.compiler(write = true)
    comp.run(g().n(3L).addE("FOLLOWS", NodeRef.Ids(Seq(1L)),
      "weight" -> VF64(0.7)).t)
    assert(singleLong(comp.run(g().eWithLabel("FOLLOWS").count().t)) == 3)
    assert(ids(comp.run(g().n(3L).out("FOLLOWS").id().t)) == Seq(1L))
  }

  test("SetProperty / RemoveProperty update matching nodes only") {
    val comp = TestBase.compiler(write = true)
    comp.run(g().n(1L).setProperty("city", VString("Oslo")).t)
    val cities = comp.run(g().nWithLabel("ParityUser").orderBy("$id").values("city").t)
    assert(rows(cities).map(_.head) == Seq("Oslo", "Paris", "Berlin"))
    comp.run(g().n(2L).removeProperty("city").t)
    val after = comp.run(g().nWithLabel("ParityUser").orderBy("$id").values("city").t)
    assert(rows(after).map(_.head) == Seq("Oslo", null, "Berlin"))
  }

  test("Drop cascades to incident edges") {
    val comp = TestBase.compiler(write = true)
    comp.run(g().n(2L).drop().t)
    assert(singleLong(comp.run(g().n().count().t)) == 2)
    assert(singleLong(comp.run(g().e().count().t)) == 0)
  }

  test("DropEdge / DropEdgeLabeled / DropEdgeById") {
    val comp = TestBase.compiler(write = true)
    comp.run(g().n(1L).t) // warm
    comp.run(Traversal(Vector(Step.N(NodeRef.Ids(Seq(1L))),
      Step.DropEdge(NodeRef.Ids(Seq(2L))))))
    assert(singleLong(comp.run(g().eWithLabel("FOLLOWS").count().t)) == 1)
    val comp2 = TestBase.compiler(write = true)
    comp2.run(Traversal(Vector(Step.E(EdgeRef.Ids(Seq(101L))), Step.DropEdgeById(EdgeRef.Ids(Seq(101L))))))
    assert(singleLong(comp2.run(g().e().count().t)) == 1)
  }

  test("SetProperty through a duplicate-visiting stream does not multiply rows") {
    val comp = TestBase.compiler(write = true)
    // make node 2 reachable twice: 1->2 exists; add 3->2
    comp.run(g().n(3L).addE("FOLLOWS", NodeRef.Ids(Seq(2L))).t)
    // n().out() now yields node 2 twice (from 1 and from 3)
    comp.run(g().n().out("FOLLOWS").setProperty("seen", VBool(true)).t)
    assert(singleLong(comp.run(g().nWithLabel("ParityUser").count().t)) == 3)
    val seen = comp.run(g().nWithLabel("ParityUser").orderBy("$id").values("seen").t)
    assert(rows(seen).map(_.head) == Seq(null, true, true))
  }

  test("AddE property can reference a current-element property") {
    val comp = TestBase.compiler(write = true)
    comp.run(Traversal(Vector(
      Step.N(NodeRef.Ids(Seq(1L))),
      Step.AddE("SCORED", NodeRef.Ids(Seq(2L)),
        Seq("w" -> PropertyInput.FromExpr(Expr.Property("score")))))))
    val w = comp.run(g().eWithLabel("SCORED").edgeProperties().t)
    assert(rows(w) == Seq(Seq(90.5))) // node 1's score, not null
  }

  test("AddE from a multi-node stream allocates unique ids without a global window") {
    val comp = TestBase.compiler(write = true)
    // 3 sources x 2 targets = 6 new edges in one AddE
    comp.run(g().n().addE("ALL_TO", NodeRef.Ids(Seq(1L, 2L))).t)
    val es = comp.run(g().eWithLabel("ALL_TO").id().t)
    val allIds = es.collect().map(_.getLong(0)).toSeq
    assert(allIds.length == 6 && allIds.distinct.length == 6)
  }

  test("CreateIndex without ifNotExists rejects duplicates; DDL keeps the store version") {
    val comp = TestBase.compiler(write = true)
    val spec = IndexSpec.NodeEquality("ParityUser", "externalId")
    val v0 = comp.store.version
    comp.run(g().createIndex(spec, ifNotExists = false).t)
    assert(comp.store.version == v0) // DDL-only change: artifacts stay valid
    comp.run(g().createIndex(spec).t) // ifNotExists = true: idempotent
    intercept[graft.exec.TraversalException] {
      comp.run(g().createIndex(spec, ifNotExists = false).t)
    }
  }

  test("index DDL registers metadata") {
    val comp = TestBase.compiler(write = true)
    comp.run(Traversal(Vector(Step.N(NodeRef.All),
      Step.CreateVectorIndexNodes("ParityUser", "embedding", Some("tenantId")))))
    assert(comp.store.indexes.contains(
      IndexSpec.NodeVector("ParityUser", "embedding", Some("tenantId"))))
  }

  test("unique index rejects duplicate AddN, allows fresh values") {
    val store = TestBase.parityGraph().withIndexes(Set(
      IndexSpec.NodeEquality("ParityUser", "externalId", unique = true)))
    val comp = TestBase.compiler(store, write = true)
    comp.run(g().addN("ParityUser", "externalId" -> VString("u9")).t) // fresh: ok
    intercept[graft.exec.TraversalException] {
      comp.run(g().addN("ParityUser", "externalId" -> VString("u1")).t) // seeded: dup
    }
    intercept[graft.exec.TraversalException] {
      comp.run(g().addN("ParityUser", "externalId" -> VString("u9")).t) // own write: dup
    }
    assert(singleLong(comp.run(g().nWithLabel("ParityUser").count().t)) == 4)
  }

  test("unique index rejects duplicates in bulk AddN (in-batch and vs store)") {
    val store = TestBase.parityGraph().withIndexes(Set(
      IndexSpec.NodeEquality("ParityUser", "externalId", unique = true)))
    def bulk(ids: String*) = Batch(Seq(
      BatchEntry.ForEach("users", Seq(
        BatchEntry.Query(NamedQuery(Some("made"),
          Traversal(Vector(Step.AddN("ParityUser", Seq(
            "externalId" -> PropertyInput.FromExpr(Expr.Param("x"))))))))))),
      returns = Nil, write = true)
    def exec(ids: String*) = new BatchExecutor(store,
      Map("users" -> VArray(ids.map(i => VObject(Map("x" -> VString(i))))))).execute(bulk())
    intercept[graft.exec.TraversalException] { exec("a1", "a1") } // in-batch dup
    intercept[graft.exec.TraversalException] { exec("b1", "u2") } // collides with store
    assert(exec("c1", "c2") != null) // fresh values pass
  }

  test("batch: vars, conditions, read-your-writes, returns") {
    val exec = new BatchExecutor(TestBase.parityGraph())
    val batch = Batch(Seq(
      BatchEntry.Query(NamedQuery(Some("created"),
        g().addN("ParityUser", "name" -> VString("Eve"), "status" -> VString("active")).t)),
      BatchEntry.Query(NamedQuery(Some("all_count"),
        g().nWithLabel("ParityUser").count().t,
        Some(BatchCondition.VarNotEmpty("created")))),
      BatchEntry.Query(NamedQuery(Some("skipped"),
        g().n().count().t, Some(BatchCondition.VarEmpty("created")))),
    ), returns = Seq("all_count", "skipped"), write = true)
    val out = exec.execute(batch)
    assert(singleLong(out.results("all_count")) == 4)
    assert(!out.results.contains("skipped"))
  }

  test("DropEdgeLabeled removes only the labeled edges") {
    val comp = TestBase.compiler(write = true)
    // add a second, differently-labeled edge 1->2, then drop only FOLLOWS
    comp.run(g().n(1L).addE("LIKES", NodeRef.Ids(Seq(2L))).t)
    comp.run(Traversal(Vector(Step.N(NodeRef.Ids(Seq(1L))),
      Step.DropEdgeLabeled(NodeRef.Ids(Seq(2L)), "FOLLOWS"))))
    assert(singleLong(comp.run(g().eWithLabel("FOLLOWS").count().t)) == 1)
    assert(singleLong(comp.run(g().eWithLabel("LIKES").count().t)) == 1)
  }

  test("foreach bulk AddN vectorizes to a single append") {
    val n = 500
    val items = VArray((0 until n).map(i =>
      VObject(Map("name" -> VString(s"U$i"), "score" -> VI64(i.toLong)))))
    val exec = new BatchExecutor(new GraphStore(spark), Map("users" -> items))
    val batch = Batch(Seq(
      BatchEntry.ForEach("users", Seq(
        BatchEntry.Query(NamedQuery(Some("made"),
          Traversal(Vector(Step.AddN("U", Seq(
            "name" -> PropertyInput.FromExpr(Expr.Param("name")),
            "score" -> PropertyInput.FromExpr(Expr.Param("score")))))))))),
      BatchEntry.Query(NamedQuery(Some("total"), g().nWithLabel("U").count().t)),
      BatchEntry.Query(NamedQuery(Some("top"),
        g().nWithLabel("U").orderBy("score", SortOrder.Desc).limit(1).values("name").t)),
    ), returns = Seq("total", "top"), write = true)
    val out = exec.execute(batch)
    assert(singleLong(out.results("total")) == n)
    assert(out.results("top").collect()(0).getString(0) == s"U${n - 1}")
  }

  test("batch: foreach over array param") {
    val params = Map("users" -> VArray(Seq(
      VObject(Map("n" -> VString("U1"))), VObject(Map("n" -> VString("U2"))))))
    val exec = new BatchExecutor(new GraphStore(spark), params)
    val batch = Batch(Seq(
      BatchEntry.ForEach("users", Seq(
        BatchEntry.Query(NamedQuery(Some("made"),
          Traversal(Vector(Step.AddN("U",
            Seq("n" -> PropertyInput.FromExpr(Expr.Param("n")))))))))),
      BatchEntry.Query(NamedQuery(Some("total"),
        g().nWithLabel("U").count().t)),
    ), returns = Seq("total"), write = true)
    assert(singleLong(exec.execute(batch).results("total")) == 2)
  }
}
