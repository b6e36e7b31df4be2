package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench harness hygiene: a failing query must surface as an error,
  * never as a fast success, and the idle guard must gate on loadavg.
  */
class BenchSpec extends AnyFunSuite {

  test("timeQueries records a throwing query as -1 with its message") {
    val out = Bench.timeQueries(Seq("ok", "boom"),
      name => if (name == "boom") throw new IllegalStateException("broken plan"),
      iters = 3)
    val byName = out.map(r => r._1 -> r).toMap
    assert(byName("ok")._2 >= 0 && byName("ok")._3.isEmpty)
    assert(byName("boom")._2 == -1.0)
    assert(byName("boom")._3.exists(_.contains("broken plan")))
  }

  test("timeQueries short-circuits a failing query's iterations") {
    var calls = 0
    Bench.timeQueries(Seq("boom"),
      _ => { calls += 1; throw new RuntimeException("x") }, iters = 3)
    assert(calls == 1)
  }

  test("timeQueries times a healthy query with no error") {
    val out = Bench.timeQueries(Seq("q"), _ => Thread.sleep(1), iters = 3)
    assert(out.head._2 > 0 && out.head._3.isEmpty)
  }

  test("idleEnough gates at 1x cores/16") {
    assert(Bench.idleEnough(2.0, 32))
    assert(!Bench.idleEnough(2.1, 32))
    assert(Bench.idleEnough(1.0, 16))
    assert(!Bench.idleEnough(1.5, 16))
  }
}
