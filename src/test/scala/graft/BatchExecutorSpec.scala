package graft

import graft.ast._
import graft.ast.PropertyValue._
import graft.dsl.Dsl._
import graft.exec.BatchExecutor

/** ForEach execution strategies: bulk AddN vectorization is covered by
  * the parity corpus (013); this spec pins the READ-side fast path —
  * per-iteration rebinding makes only the last element observable, so
  * an eligible read body runs ONE evaluation, not one per element.
  */
class BatchExecutorSpec extends GraftSuite {

  private def lookupBody(name: String = "matched") = Seq(
    BatchEntry.Query(NamedQuery(Some(name),
      g().nWithLabel("ParityUser")
        .where(Predicate.EqExpr("externalId", Expr.Param("externalId")))
        .valueMap("externalId", "name").t)))

  private def lookups(n: Int): PropertyValue = VArray(
    (0 until n).map { i =>
      val ext = if (i == n - 1) "u3" else "u1"
      VObject(Map("externalId" -> VString(ext)))
    })

  test("a 1k-element read foreach runs a bounded number of jobs, not one per element") {
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    sc.addSparkListener(listener)
    try {
      val r = new BatchExecutor(TestBase.parityGraph(),
        Map("lookups" -> lookups(1000)))
        .execute(Batch(Seq(BatchEntry.ForEach("lookups", lookupBody())),
          returns = Seq("matched")))
      val got = r.results("matched").collect().map(_.getString(0))
      assert(got.toSeq == Seq("u3")) // last iteration's binding
      // listener events are async; give the bus a beat to drain
      Thread.sleep(500)
      assert(jobs.get() < 20,
        s"expected a bounded job count, got ${jobs.get()} (driver loop would be >1000)")
    } finally sc.removeSparkListener(listener)
  }

  test("fast-path result equals the driver loop's (forced via a body condition)") {
    val store = TestBase.parityGraph()
    val params = Map("lookups" -> lookups(3))
    val fast = new BatchExecutor(store, params)
      .execute(Batch(Seq(BatchEntry.ForEach("lookups", lookupBody())),
        returns = Seq("matched")))
    // PrevNotEmpty forces the general loop (conditions are ineligible)
    // without changing which iterations run
    val loopBody = Seq(BatchEntry.Query(NamedQuery(Some("matched"),
      g().nWithLabel("ParityUser")
        .where(Predicate.EqExpr("externalId", Expr.Param("externalId")))
        .valueMap("externalId", "name").t,
      Some(BatchCondition.PrevNotEmpty))))
    val loop = new BatchExecutor(store, params)
      .execute(Batch(Seq(BatchEntry.ForEach("lookups", loopBody)),
        returns = Seq("matched")))
    assert(fast.results("matched").collect().toSeq ==
      loop.results("matched").collect().toSeq)
  }

  test("a body that reads a variable it binds keeps the loop (cross-iteration dependence)") {
    val store = TestBase.parityGraph()
    // body: inject the previously-bound 'acc', store back into 'acc' —
    // iteration i observes iteration i-1's stream, so the fast path
    // must decline; with 2 iterations the final acc is alice ∪ bob
    val seed = BatchEntry.Query(NamedQuery(Some("acc"),
      g().nWithLabel("ParityUser")
        .where(Predicate.Eq("externalId", VString("u1"))).t))
    val body = Seq(BatchEntry.Query(NamedQuery(Some("acc"),
      Traversal(Vector(
        Step.NWhere(Predicate.EqExpr("externalId", Expr.Param("externalId"))),
        Step.Inject("acc"), Step.StoreVar("acc"))))))
    val r = new BatchExecutor(store,
      Map("items" -> VArray(Seq(
        VObject(Map("externalId" -> VString("u2"))),
        VObject(Map("externalId" -> VString("u3")))))))
      .execute(Batch(Seq(seed, BatchEntry.ForEach("items", body)),
        returns = Seq("acc")))
    val ids = r.results("acc").select("_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L), s"loop must accumulate, got $ids")
  }

  test("an element missing a referenced param keeps the loop, so the error surfaces") {
    // the loop raises "missing param" on the FIRST offending element;
    // the fast path must not swallow it by only evaluating the last
    val r = intercept[Exception] {
      new BatchExecutor(TestBase.parityGraph(),
        Map("lookups" -> VArray(Seq(
          VObject(Map("wrongField" -> VString("x"))),
          VObject(Map("externalId" -> VString("u3")))))))
        .execute(Batch(Seq(BatchEntry.ForEach("lookups", lookupBody())),
          returns = Seq("matched")))
    }
    assert(r.getMessage.toLowerCase.contains("param"), r.getMessage)
  }

  test("VarMinSize gates at exactly k without a full count") {
    // 3 ParityUsers: k=3 passes, k=4 blocks — the limit(k)-bounded
    // scan must preserve the >= k contract exactly at the threshold
    def run(k: Long) = new BatchExecutor(TestBase.parityGraph(), Map.empty)
      .execute(Batch(Seq(
        BatchEntry.Query(NamedQuery(Some("users"),
          g().nWithLabel("ParityUser").t)),
        BatchEntry.Query(NamedQuery(Some("gated"),
          Traversal(Vector(Step.Inject("users"), Step.Count)),
          Some(BatchCondition.VarMinSize("users", k))))),
        returns = Seq("gated")))
    assert(run(3).results.contains("gated"))
    assert(!run(4).results.contains("gated"))
  }

  test("a mutating body never takes the read fast path") {
    // the arithmetic property makes it ineligible for bulk AddN too,
    // so this pins the general loop running every iteration
    val addOne = NamedQuery(Some("made"), Traversal(Vector(
      Step.AddN("ParityUser", Seq(
        "name" -> PropertyInput.FromExpr(Expr.Param("nm")),
        "x" -> PropertyInput.FromExpr(
          Expr.Add(Expr.Constant(VI64(1)), Expr.Constant(VI64(2)))))))))
    val batch = Batch(
      Seq(BatchEntry.ForEach("rows", Seq(BatchEntry.Query(addOne)))),
      returns = Seq("made"), write = true)
    val r = new BatchExecutor(TestBase.parityGraph(),
      Map("rows" -> VArray(Seq(
        VObject(Map("nm" -> VString("D1"))),
        VObject(Map("nm" -> VString("D2")))))))
      .execute(batch)
    // ineligible for bulk AddN (arith expr) AND for the read fast path
    // (mutation): the loop ran both iterations
    val names = r.store.nodesFor("ParityUser")
      .select("name").collect().map(_.getString(0)).toSet
    assert(Set("D1", "D2").subsetOf(names), s"got $names")
  }
}
