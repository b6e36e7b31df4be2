package graft

import graft.model.GraphWal
import graft.server.Gateway

/** Incremental write durability: the GraphWal segment log + manifest.
  * The gate is the kill-and-reload shape — a sequence of write batches
  * survives recovery with ids, properties, and indexes intact, without
  * any full-table re-save between batches.
  */
class WalSpec extends GraftSuite {

  private def addN(name: String, age: Long): String =
    s"""{"request_type":"write","query":{"queries":[{"Query":{"name":"created",
      "steps":[{"AddN":{"label":"ParityUser","properties":[
      ["name",{"Value":{"String":"$name"}}],
      ["age",{"Value":{"I64":$age}}]]}}],"condition":null}}],
      "returns":["created"]},"parameters":{}}"""

  private def userRows(store: graft.model.GraphStore) =
    store.nodesFor("ParityUser")
      .select("_id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("write batches survive kill-and-reload with ids intact") {
    val dir = java.nio.file.Files.createTempDirectory("gwal").toString
    val base = TestBase.parityGraph()
    // checkpoint = full snapshot + empty manifest
    GraphWal.checkpoint(base, dir)
    val gw = new Gateway(GraphWal.recover(spark, dir), walRoot = Some(dir))
    gw.handle(addN("Dana", 28))
    gw.handle(addN("Eve", 35))
    gw.handle(
      """{"request_type":"write","query":{"queries":[{"Query":{"name":"upd",
        "steps":[{"NWhere":{"Eq":["name",{"String":"Dana"}]}},
        {"SetProperty":["age",{"Value":{"I64":29}}]}],"condition":null}}],
        "returns":["upd"]},"parameters":{}}""")
    val live = userRows(gw.currentStore)
    assert(live.map(_._2) == Set("Alice", "Bob", "Carol", "Dana", "Eve"))

    // "kill": recover purely from disk — snapshot + segment replay
    val recovered = GraphWal.recover(spark, dir)
    assert(userRows(recovered) == live) // ids AND names bit-identical
    val danaAge = recovered.nodesFor("ParityUser")
      .where(org.apache.spark.sql.functions.col("name") === "Dana")
      .select("age").head().getLong(0)
    assert(danaAge == 29)
    // declared indexes survive via the snapshot meta
    assert(recovered.indexes == base.indexes)
  }

  test("recovery ignores segments that never reached the manifest") {
    val dir = java.nio.file.Files.createTempDirectory("gwal2").toString
    GraphWal.checkpoint(TestBase.parityGraph(), dir)
    val gw = new Gateway(GraphWal.recover(spark, dir), walRoot = Some(dir))
    gw.handle(addN("Dana", 28))
    // simulate a crash mid-commit: a segment file exists but the
    // manifest was never flipped — recovery must not apply it
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "wal", "seg-2.json"), "{ garbage")
    val recovered = GraphWal.recover(spark, dir)
    assert(userRows(recovered).map(_._2) == Set("Alice", "Bob", "Carol", "Dana"))
  }

  test("checkpoint folds the log: segments truncate, state persists") {
    val dir = java.nio.file.Files.createTempDirectory("gwal3").toString
    GraphWal.checkpoint(TestBase.parityGraph(), dir)
    val gw = new Gateway(GraphWal.recover(spark, dir), walRoot = Some(dir))
    gw.handle(addN("Dana", 28))
    gw.handle(addN("Eve", 35))
    val before = userRows(GraphWal.recover(spark, dir))
    GraphWal.checkpoint(gw.currentStore, dir)
    // log folded into the snapshot: no segments left to replay
    val segs = new java.io.File(s"$dir/wal").listFiles()
      .filter(_.getName.startsWith("seg-"))
    assert(segs.isEmpty)
    assert(userRows(GraphWal.recover(spark, dir)) == before)
    // and the log keeps accepting post-checkpoint writes
    val gw2 = new Gateway(GraphWal.recover(spark, dir), walRoot = Some(dir))
    gw2.handle(addN("Frank", 41))
    assert(userRows(GraphWal.recover(spark, dir)).map(_._2).contains("Frank"))
  }
}
