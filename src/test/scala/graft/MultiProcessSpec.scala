package graft

import graft.model.GraphWal
import graft.server.QueryRunner

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

/** The writer/reader protocol's no-shared-memory claim, tested for
  * real: a SECOND JVM (fresh SparkSession, zero objects shared with
  * this one) opens the WAL root this process wrote and serves the
  * committed data through the replica read path. This is the local
  * stand-in for N reader machines tailing one WAL on shared storage —
  * everything the reader needs must round-trip through the manifest +
  * segment files, or this test fails.
  */
class MultiProcessSpec extends GraftSuite {

  private val countReq =
    """{"request_type":"read","query":{"queries":[{"Query":{"name":"n",
      "steps":[{"NWhere":{"Eq":["$label",{"String":"ParityUser"}]}},"Count"],
      "condition":null}}],"returns":["n"]},"parameters":{}}"""

  private val addDana =
    """{"request_type":"write","query":{"queries":[{"Query":{"name":"w",
      "steps":[{"AddN":{"label":"ParityUser","properties":[
      ["name",{"Value":{"String":"Dana"}}]]}}],"condition":null}}],
      "returns":["w"]},"parameters":{}}"""

  /** Same module-opens set as build.sbt / spark-submit inject. */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runChild(args: Seq[String]): (Int, String, String) = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.server.QueryRunner") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_CPUS", "2")
    val p = pb.start()
    val out = new java.io.ByteArrayOutputStream
    val err = new java.io.ByteArrayOutputStream
    val t1 = drain(p.getInputStream, out)
    val t2 = drain(p.getErrorStream, err)
    try {
      assert(p.waitFor(240, TimeUnit.SECONDS), "child JVM timed out")
      t1.join(5000); t2.join(5000)
      (p.exitValue(), out.toString("UTF-8"), err.toString("UTF-8"))
    } finally if (p.isAlive) p.destroyForcibly() // never leak a hung child
  }

  private def drain(in: java.io.InputStream, to: java.io.OutputStream): Thread = {
    val t = new Thread(() => in.transferTo(to))
    t.setDaemon(true); t.start(); t
  }

  test("a second JVM serves this process's WAL commits via the replica path") {
    val dir = Files.createTempDirectory("mproc").toString
    GraphWal.checkpoint(TestBase.parityGraph(), dir)
    // commit one write from THIS process (segment-logged, not checkpointed):
    // the child must replay it from the log, not just read the snapshot
    QueryRunner.run(spark, Seq("--store", dir, "--json", addDana))
    val (code, out, err) = runChild(
      Seq("--store", dir, "--replica", "--json", countReq))
    assert(code == 0, s"child failed: $err")
    assert(out.linesIterator.toSeq.lastOption.map(_.trim).contains("""{"n":4}"""),
      s"unexpected child stdout: $out")
  }

  test("a replica process refuses write envelopes") {
    val dir = Files.createTempDirectory("mproc2").toString
    GraphWal.checkpoint(TestBase.parityGraph(), dir)
    intercept[IllegalArgumentException](
      QueryRunner.run(spark, Seq("--store", dir, "--replica", "--json", addDana)))
  }
}
