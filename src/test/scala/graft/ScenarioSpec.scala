package graft

import graft.model.GraphStore
import graft.server.Gateway

/** End-to-end scenario in the spirit of the reference's ordered runtime
  * parity corpus (sdks/tests/parity: seed graph → counts → projections →
  * conditions/foreach → mutations → branching → drops → final counts),
  * driven entirely through the wire protocol.
  */
class ScenarioSpec extends GraftSuite {

  private def post(gw: Gateway, body: String): String = gw.handle(body)

  test("seed -> traverse -> mutate -> drop lifecycle over the wire") {
    val gw = new Gateway(new GraphStore(spark))

    // 001: seed users via foreach over an array param (fixture 012/013 shape)
    post(gw,
      """{"request_type":"write","query":{"queries":[
        {"ForEach":{"param":"users","body":[
          {"Query":{"name":"u","steps":[{"AddN":{"label":"User","properties":[
            ["name",{"Expr":{"Param":"name"}}],
            ["age",{"Expr":{"Param":"age"}}],
            ["status",{"Expr":{"Param":"status"}}]]}}],"condition":null}}]}}],
        "returns":[]},
        "parameters":{"users":[
          {"name":"Alice","age":31,"status":"active"},
          {"name":"Bob","age":27,"status":"active"},
          {"name":"Carol","age":42,"status":"inactive"}]}}""")

    // 002: count
    assert(post(gw,
      """{"request_type":"read","query":{"queries":[{"Query":{"name":"n",
        "steps":[{"NWhere":{"Eq":["$label",{"String":"User"}]}},"Count"],
        "condition":null}}],"returns":["n"]},"parameters":{}}""") == """{"n":3}""")

    // 003: link followers (Alice -> Bob) by querying ids through vars
    post(gw,
      """{"request_type":"write","query":{"queries":[
        {"Query":{"name":"alice","steps":[
          {"NWhere":{"Eq":["name",{"String":"Alice"}]}}],"condition":null}},
        {"Query":{"name":"bob","steps":[
          {"NWhere":{"Eq":["name",{"String":"Bob"}]}}],"condition":null}},
        {"Query":{"name":"e","steps":[
          {"N":{"Var":"alice"}},
          {"AddE":{"label":"FOLLOWS","to":{"Var":"bob"},"properties":[
            ["weight",{"Value":{"F64":1.0}}]]}}],
          "condition":{"VarNotEmpty":"alice"}}}],
        "returns":[]},"parameters":{}}""")

    // 004: traverse out and project
    assert(post(gw,
      """{"request_type":"read","query":{"queries":[{"Query":{"name":"f",
        "steps":[{"NWhere":{"Eq":["name",{"String":"Alice"}]}},
        {"Out":"FOLLOWS"},{"Values":["name"]}],"condition":null}}],
        "returns":["f"]},"parameters":{}}""") == """{"f":"Bob"}""")

    // 005: group_count by status
    val gc = post(gw,
      """{"request_type":"read","query":{"queries":[{"Query":{"name":"by_status",
        "steps":[{"NWhere":{"Eq":["$label",{"String":"User"}]}},
        {"GroupCount":"status"}],"condition":null}}],
        "returns":["by_status"]},"parameters":{}}""")
    assert(gc.contains(""""status":"active","cnt":2"""))
    assert(gc.contains(""""status":"inactive","cnt":1"""))

    // 006: conditional skipped query (VarEmpty fails -> omitted from results)
    assert(post(gw,
      """{"request_type":"read","query":{"queries":[
        {"Query":{"name":"seed","steps":[
          {"NWhere":{"Eq":["$label",{"String":"User"}]}}],"condition":null}},
        {"Query":{"name":"skipped","steps":[{"N":"All"},"Count"],
          "condition":{"VarEmpty":"seed"}}}],
        "returns":["skipped"]},"parameters":{}}""") == "{}")

    // 007: set_property then verify via where
    post(gw,
      """{"request_type":"write","query":{"queries":[{"Query":{"name":"m",
        "steps":[{"NWhere":{"Eq":["name",{"String":"Carol"}]}},
        {"SetProperty":["status",{"Value":{"String":"active"}}]}],
        "condition":null}}],"returns":[]},"parameters":{}}""")
    assert(post(gw,
      """{"request_type":"read","query":{"queries":[{"Query":{"name":"n",
        "steps":[{"NWhere":{"Eq":["status",{"String":"active"}]}},"Count"],
        "condition":null}}],"returns":["n"]},"parameters":{}}""") == """{"n":3}""")

    // 008: drop Bob (cascades the FOLLOWS edge), final counts
    post(gw,
      """{"request_type":"write","query":{"queries":[{"Query":{"name":"d",
        "steps":[{"NWhere":{"Eq":["name",{"String":"Bob"}]}},"Drop"],
        "condition":null}}],"returns":[]},"parameters":{}}""")
    assert(post(gw,
      """{"request_type":"read","query":{"queries":[
        {"Query":{"name":"nodes","steps":[{"N":"All"},"Count"],"condition":null}},
        {"Query":{"name":"edges","steps":[{"E":"All"},"Count"],"condition":null}}],
        "returns":["nodes","edges"]},"parameters":{}}""") ==
      """{"edges":0,"nodes":2}""")
  }
}
