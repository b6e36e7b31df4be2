package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.ast._
import graft.ast.PropertyValue._
import graft.dsl.Dsl._
import graft.model.GraphStore
import graft.server.Gateway

import scala.jdk.CollectionConverters._

/** The reference's ORDERED runtime scenario corpus 001-032
  * (generate_parity_fixtures.rs:159-869, runtime bucket), replayed as
  * one sequential lifecycle against a single gateway: seed -> reads ->
  * conditions/foreach -> mutations -> control flow -> aggregations ->
  * index DDL -> search -> drops -> final counts. Every request goes
  * through the wire codec (writeRequest -> gateway handle), and each
  * scenario asserts its terminal values.
  */
class RuntimeCorpusSpec extends GraftSuite {

  private lazy val gw = new Gateway(new GraphStore(spark))
  private val M = new ObjectMapper()

  private def q(name: String, tr: graft.dsl.Tr,
      cond: Option[BatchCondition] = None): BatchEntry =
    BatchEntry.Query(NamedQuery(Some(name), tr.t, cond))

  private def run(write: Boolean, returns: Seq[String],
      params: Map[String, PropertyValue], entries: BatchEntry*): JsonNode = {
    val json = Json.writeRequest(Json.Request(write, None,
      Batch(entries, returns, write), params))
    M.readTree(gw.handle(json))
  }

  private def rows(n: JsonNode): Seq[JsonNode] =
    if (n.isArray) n.elements.asScala.toSeq else Seq(n)
  private def field(n: JsonNode, f: String): Seq[String] =
    rows(n).map(r => Option(r.get(f)).map(_.asText).orNull)

  private def userProps(extId: String, name: String, age: Long, score: Double,
      status: String, city: String, bio: String, emb: Seq[Float]): Seq[(String, PropertyValue)] =
    Seq("externalId" -> VString(extId), "name" -> VString(name), "age" -> VI64(age),
      "score" -> VF64(score), "status" -> VString(status),
      "tenantId" -> VString("tenant-a"), "city" -> VString(city), "bio" -> VString(bio),
      "createdAt" -> VDateTime(1776000000000L), "embedding" -> VF32Array(emb))

  test("001-write-seed-core") {
    val r = run(write = true,
      Seq("alice", "bob", "carol", "alice_follows_bob", "bob_follows_carol"), Map.empty,
      q("alice", g().addN("ParityUser", userProps("user-alice", "Alice", 31, 90.5,
        "active", "London", "Alice writes graph database tests", Seq(1.0f, 0.0f, 0.0f)): _*)),
      q("bob", g().addN("ParityUser", userProps("user-bob", "Bob", 27, 72.25,
        "active", "Paris", "Bob likes traversal testing", Seq(0.9f, 0.1f, 0.0f)): _*)),
      q("carol", g().addN("ParityUser", userProps("user-carol", "Carol", 42, 64.0,
        "inactive", "Berlin", "Carol archives old records", Seq(0.0f, 1.0f, 0.0f)): _*)),
      q("alice_follows_bob", g().nVar("alice").addE("FOLLOWS", NodeRef.Var("bob"),
        "weight" -> VF64(1.0), "since" -> VString("2024-01-01"),
        "note" -> VString("Alice follows Bob"), "embedding" -> VF32Array(Seq(1.0f, 0.0f)))),
      q("bob_follows_carol", g().nVar("bob").addE("FOLLOWS", NodeRef.Var("carol"),
        "weight" -> VF64(0.5), "since" -> VString("2024-02-01"),
        "note" -> VString("Bob follows Carol"), "embedding" -> VF32Array(Seq(0.0f, 1.0f)))))
    assert(field(r.get("alice"), "externalId") == Seq("user-alice"))
    assert(field(r.get("carol"), "status") == Seq("inactive"))
    assert(field(r.get("alice_follows_bob"), "note") == Seq("Alice follows Bob"))
    assert(field(r.get("bob_follows_carol"), "weight") == Seq("0.5"))
  }

  test("002-read-count-all-users") {
    val r = run(write = false, Seq("user_count"), Map.empty,
      q("user_count", g().nWithLabel("ParityUser").count()))
    assert(r.get("user_count").asLong == 3L)
  }

  test("003-read-source-predicate-and-count") {
    val r = run(write = false, Seq("active_adults"), Map.empty,
      q("active_adults", g().nWithLabelWhere("ParityUser",
        and(eq_("status", "active"), Predicate.Gte("age", VI64(30)))).count()))
    assert(r.get("active_adults").asLong == 1L) // Alice only
  }

  test("004-read-value-map-projection") {
    val r = run(write = false, Seq("alice"), Map.empty,
      q("alice", g().nWithLabel("ParityUser").where(eq_("externalId", "user-alice"))
        .project(
          Projection.Property("externalId", "id"),
          Projection.Property("name", "name"),
          Projection.Computed("score_plus_one", Expr.Add(prop("score"), lit_(1.0))),
          Projection.Computed("status_label", Expr.Case(
            Seq(eq_("status", "active") -> lit_("enabled")), Some(lit_("disabled")))))))
    val row = rows(r.get("alice")).head
    assert(row.get("id").asText == "user-alice")
    assert(row.get("score_plus_one").asDouble == 91.5)
    assert(row.get("status_label").asText == "enabled")
  }

  test("005-read-order-range-values") {
    val r = run(write = false, Seq("ordered"), Map.empty,
      q("ordered", g().nWithLabel("ParityUser")
        .orderByMultiple(("status", SortOrder.Asc), ("age", SortOrder.Desc))
        .range(0, 2).valueMap("externalId", "age", "status")))
    assert(field(r.get("ordered"), "externalId") == Seq("user-alice", "user-bob"))
  }

  test("006-read-edge-count") {
    val r = run(write = false, Seq("edge_count"), Map.empty,
      q("edge_count", g().nWithLabel("ParityUser")
        .where(eq_("externalId", "user-alice")).outE("FOLLOWS").count()))
    assert(r.get("edge_count").asLong == 1L)
  }

  test("007-read-edge-properties") {
    val r = run(write = false, Seq("edges"), Map.empty,
      q("edges", g().eWithLabel("FOLLOWS")
        .edgeHas("weight", VF64(1.0)).edgeProperties()))
    assert(field(r.get("edges"), "note") == Seq("Alice follows Bob"))
  }

  test("008-read-edge-endpoints") {
    val r = run(write = false, Seq("from_nodes", "to_nodes"), Map.empty,
      q("from_nodes", g().eWithLabel("FOLLOWS").edgeHasLabel("FOLLOWS").inN()
        .valueMap("externalId", "name")),
      q("to_nodes", g().eWithLabel("FOLLOWS").outN().valueMap("externalId", "name")))
    assert(field(r.get("from_nodes"), "externalId").toSet == Set("user-alice", "user-bob"))
    assert(field(r.get("to_nodes"), "externalId").toSet == Set("user-bob", "user-carol"))
  }

  test("009-read-conditional-var-not-empty") {
    val r = run(write = false, Seq("alice", "friends"), Map.empty,
      q("alice", g().nWithLabel("ParityUser").where(eq_("externalId", "user-alice"))),
      q("friends", g().nVar("alice").out("FOLLOWS").valueMap("externalId", "name"),
        Some(BatchCondition.VarNotEmpty("alice"))))
    assert(field(r.get("friends"), "externalId") == Seq("user-bob"))
  }

  test("010-read-conditional-var-empty") {
    val r = run(write = false, Seq("missing", "fallback"), Map.empty,
      q("missing", g().nWithLabel("ParityUser").where(eq_("externalId", "missing-user"))),
      q("fallback", g().nWithLabel("ParityUser").limit(1).valueMap("externalId"),
        Some(BatchCondition.VarEmpty("missing"))))
    assert(rows(r.get("missing")).isEmpty || r.get("missing").size == 0)
    assert(rows(r.get("fallback")).size == 1)
  }

  test("011-read-conditional-var-min-size-prev") {
    val r = run(write = false, Seq("min_two", "prev_ok"), Map.empty,
      q("users", g().nWithLabel("ParityUser").limit(3)),
      q("min_two", g().nVar("users").count(), Some(BatchCondition.VarMinSize("users", 2))),
      q("prev_ok", g().nVar("users").exists(), Some(BatchCondition.PrevNotEmpty)))
    assert(r.get("min_two").asLong == 3L)
    assert(r.get("prev_ok").asBoolean)
  }

  test("012-read-foreach-param") {
    val r = run(write = false, Seq("matched"),
      Map("lookups" -> VArray(Seq(
        VObject(Map("externalId" -> VString("user-alice"))),
        VObject(Map("externalId" -> VString("user-carol")))))),
      BatchEntry.ForEach("lookups", Seq(
        q("matched", g().nWithLabel("ParityUser")
          .where(Predicate.EqExpr("externalId", Expr.Param("externalId")))
          .valueMap("externalId", "name")))))
    // per-iteration rebinding: the returned var holds the LAST iteration
    assert(field(r.get("matched"), "externalId") == Seq("user-carol"))
  }

  test("013-write-foreach-param-create") {
    val r = run(write = true, Seq("created"),
      Map("rows" -> VArray(Seq(
        VObject(Map("eventId" -> VString("event-1"), "kind" -> VString("click"),
          "score" -> VI64(10))),
        VObject(Map("eventId" -> VString("event-2"), "kind" -> VString("view"),
          "score" -> VI64(5)))))),
      BatchEntry.ForEach("rows", Seq(
        q("created", g().addNIn("ParityEvent",
          "eventId" -> PropertyInput.FromExpr(Expr.Param("eventId")),
          "kind" -> PropertyInput.FromExpr(Expr.Param("kind")),
          "score" -> PropertyInput.FromExpr(Expr.Param("score")))))))
    assert(field(r.get("created"), "eventId").toSet == Set("event-1", "event-2"))
  }

  test("014-read-after-foreach-param") {
    val r = run(write = false, Seq("event_count"), Map.empty,
      q("event_count", g().nWithLabel("ParityEvent").count()))
    assert(r.get("event_count").asLong == 2L)
  }

  test("015-write-set-remove-properties") {
    val r = run(write = true, Seq("updated"), Map.empty,
      q("updated", g().nWithLabel("ParityUser").where(eq_("externalId", "user-bob"))
        .setProperty("status", VString("inactive"))
        .setProperty("updatedAt", VDateTime(1777000000000L))
        .removeProperty("city").count()))
    assert(r.get("updated").asLong == 1L)
  }

  test("016-read-updated-properties") {
    val r = run(write = false, Seq("bob"), Map.empty,
      q("bob", g().nWithLabel("ParityUser").where(eq_("externalId", "user-bob"))
        .valueMap("externalId", "status", "updatedAt", "city")))
    val row = rows(r.get("bob")).head
    assert(row.get("status").asText == "inactive")
    assert(row.get("city").isNull) // removed -> explicit null
    assert(!row.get("updatedAt").isNull)
  }

  test("017-read-repeat-union") {
    val r = run(write = false, Seq("walked"), Map.empty,
      q("walked", g().nWithLabel("ParityUser").where(eq_("externalId", "user-alice"))
        .repeat(RepeatConfig(sub().out("FOLLOWS").t, times = Some(2),
          emit = EmitBehavior.All, maxDepth = 4))
        .union(sub().out("FOLLOWS"), sub().in("FOLLOWS"))
        .dedup().valueMap("externalId", "name")))
    assert(field(r.get("walked"), "externalId").toSet ==
      Set("user-alice", "user-bob", "user-carol"))
  }

  test("018-read-choose-coalesce-optional") {
    val r = run(write = false, Seq("branched"), Map.empty,
      q("branched", g().nWithLabel("ParityUser").where(eq_("externalId", "user-alice"))
        .choose(eq_("status", "active"), sub().out("FOLLOWS"), sub().in("FOLLOWS"))
        .coalesceSteps(sub().out("FOLLOWS"), sub().in("FOLLOWS"))
        .optional(sub().out("FOLLOWS"))
        .dedup().valueMap("externalId", "name")))
    // alice active -> bob; coalesce: bob.out -> carol; optional: carol.out empty -> carol
    assert(field(r.get("branched"), "externalId") == Seq("user-carol"))
  }

  test("019-read-aggregations") {
    val r = run(write = false, Seq("by_status", "mean_score", "max_age"), Map.empty,
      q("by_status", g().nWithLabel("ParityUser").groupCount("status")),
      q("mean_score", g().nWithLabel("ParityUser").aggregateBy(AggFn.Mean, "score")),
      q("max_age", g().nWithLabel("ParityUser").aggregateBy(AggFn.Max, "age")))
    val byStatus = rows(r.get("by_status"))
      .map(x => x.get("status").asText -> x.get("cnt").asLong).toMap
    assert(byStatus == Map("active" -> 1L, "inactive" -> 2L)) // bob inactive since 015
    assert(math.abs(r.get("mean_score").asDouble - 75.58333333333333) < 1e-9)
    assert(r.get("max_age").asLong == 42L)
  }

  test("020-write-index-create") {
    val r = run(write = true, Seq("node_eq", "node_range", "edge_eq", "edge_range"), Map.empty,
      q("node_eq", g().createIndex(IndexSpec.NodeEquality("ParityUser", "externalId"))),
      q("node_range", g().createIndex(IndexSpec.NodeRange("ParityUser", "age"))),
      q("edge_eq", g().createIndex(IndexSpec.EdgeEquality("FOLLOWS", "since"))),
      q("edge_range", g().createIndex(IndexSpec.EdgeRange("FOLLOWS", "weight"))))
    assert(r.has("node_eq") && r.has("edge_range"))
    assert(gw.currentStore.indexes.contains(IndexSpec.NodeEquality("ParityUser", "externalId")))
    assert(gw.currentStore.indexes.contains(IndexSpec.EdgeRange("FOLLOWS", "weight")))
  }

  test("021-read-parameter-types") {
    // raw envelope: parameter_types drive DateTime/array coercion on the wire
    val resp = M.readTree(gw.handle(
      """{"request_type":"read","query":{"queries":[{"Query":{"name":"matches","steps":[
        {"NWhere":{"Eq":["$label",{"String":"ParityUser"}]}},
        {"Where":{"IsInExpr":["status",{"Param":"statuses"}]}},
        {"Where":{"GteExpr":["createdAt",{"Param":"created_after"}]}},
        {"LimitBy":{"Param":"limit"}},
        {"ValueMap":["externalId","status"]}],"condition":null}}],
        "returns":["matches"]},
        "parameters":{"statuses":["active","inactive"],
          "created_after":"2026-01-01T00:00:00.000Z","limit":5},
        "parameter_types":{"statuses":{"Array":"String"},
          "created_after":"DateTime","limit":"I64"}}"""))
    assert(field(resp.get("matches"), "externalId").toSet ==
      Set("user-alice", "user-bob", "user-carol")) // createdAt 2026-04 >= 2026-01
  }

  test("022-write-property-value-variants") {
    val r = run(write = true, Seq("variant_node"), Map.empty,
      q("variant_node", g().addN("ParityVariant",
        "nullValue" -> VNull, "boolValue" -> VBool(true),
        "i64Value" -> VI64(9223372036854775000L),
        "dateTimeValue" -> VDateTime(-1L),
        "f64Value" -> VF64(3.25), "f32Value" -> VF32(1.5f),
        "stringValue" -> VString("variant"),
        "bytesValue" -> VBytes(Array[Byte](1, 2, 3)),
        "i64Array" -> VI64Array(Seq(1L, 2L, 3L)),
        "f64Array" -> VF64Array(Seq(1.0, 2.0)),
        "f32Array" -> VF32Array(Seq(1.0f, 2.0f)),
        "stringArray" -> VStringArray(Seq("a", "b")))))
    val row = rows(r.get("variant_node")).head
    assert(row.get("i64Value").asLong == 9223372036854775000L)
    assert(row.get("stringValue").asText == "variant")
  }

  test("023-read-property-value-variants") {
    val r = run(write = false, Seq("variant"), Map.empty,
      q("variant", g().nWithLabel("ParityVariant").valueMap()))
    val row = rows(r.get("variant")).head
    assert(row.get("nullValue").isNull)
    assert(row.get("boolValue").asBoolean)
    assert(row.get("bytesValue").asText == "AQID") // base64 of [1,2,3]
    assert(row.get("i64Array").elements.asScala.map(_.asLong).toSeq == Seq(1L, 2L, 3L))
    assert(row.get("stringArray").elements.asScala.map(_.asText).toSeq == Seq("a", "b"))
  }

  test("024-write-text-vector-indexes") {
    val r = run(write = true,
      Seq("node_text", "node_vector", "edge_text", "edge_vector"), Map.empty,
      q("node_text", g().createTextIndexNodes("ParityUser", "bio")),
      q("node_vector", g().createVectorIndexNodes("ParityUser", "embedding")),
      q("edge_text", g().createTextIndexEdges("FOLLOWS", "note")),
      q("edge_vector", g().createVectorIndexEdges("FOLLOWS", "embedding")))
    assert(r.has("node_text"))
    assert(gw.currentStore.indexes.contains(IndexSpec.NodeText("ParityUser", "bio", None)))
    assert(gw.currentStore.indexes.contains(IndexSpec.EdgeVector("FOLLOWS", "embedding", None)))
  }

  test("025-read-text-search-nodes") {
    val r = run(write = false, Seq("text_hits"), Map.empty,
      q("text_hits", g().textSearchNodes("ParityUser", "bio", "graph", 5)
        .valueMap("externalId", "bio", "$distance")))
    assert(field(r.get("text_hits"), "externalId").head == "user-alice")
  }

  test("026-read-vector-search-nodes") {
    val r = run(write = false, Seq("vector_hits"), Map.empty,
      q("vector_hits", g().vectorSearchNodes("ParityUser", "embedding",
        Seq(1.0f, 0.0f, 0.0f), 3).project(
        Projection.Property("externalId", "externalId"),
        Projection.Property("$distance", "distance"))))
    assert(field(r.get("vector_hits"), "externalId").head == "user-alice")
    assert(rows(r.get("vector_hits")).size == 3)
  }

  test("027-read-text-search-edges") {
    val r = run(write = false, Seq("edge_text_hits"), Map.empty,
      q("edge_text_hits", g().textSearchEdges("FOLLOWS", "note", "follows", 5)
        .edgeProperties()))
    assert(rows(r.get("edge_text_hits")).size == 2) // both notes contain "follows"
  }

  test("028-read-vector-search-edges") {
    val r = run(write = false, Seq("edge_vector_hits"), Map.empty,
      q("edge_vector_hits", g().vectorSearchEdges("FOLLOWS", "embedding",
        Seq(1.0f, 0.0f), 5).edgeProperties()))
    val notes = field(r.get("edge_vector_hits"), "note")
    assert(notes.size == 2 && notes.head == "Alice follows Bob") // [1,0] nearest first
  }

  test("029-write-drop-temp-node") {
    val r = run(write = true, Seq("dropped"), Map.empty,
      q("temp", g().addN("ParityTemp", "name" -> VString("temp"))),
      q("dropped", g().nVar("temp").drop().count()))
    assert(r.get("dropped").asLong == 0L) // post-drop stream is empty
  }

  test("030-read-final-counts") {
    val r = run(write = false, Seq("users", "events", "variants", "temps"), Map.empty,
      q("users", g().nWithLabel("ParityUser").count()),
      q("events", g().nWithLabel("ParityEvent").count()),
      q("variants", g().nWithLabel("ParityVariant").count()),
      q("temps", g().nWithLabel("ParityTemp").count()))
    assert(r.get("users").asLong == 3L)
    assert(r.get("events").asLong == 2L)
    assert(r.get("variants").asLong == 1L)
    assert(r.get("temps").asLong == 0L)
  }

  test("031-read-source-predicate-eq-param") {
    val r = run(write = false, Seq("user"), Map("name" -> VString("Alice")),
      q("user", g().nWhere(and(eq_("$label", "ParityUser"),
        Predicate.EqExpr("name", Expr.Param("name")))).valueMap("externalId", "name")))
    assert(field(r.get("user"), "externalId") == Seq("user-alice"))
  }

  test("032-read-source-predicate-between-param") {
    val r = run(write = false, Seq("adults"), Map("min_age" -> VI64(30)),
      q("adults", g().nWhere(and(eq_("$label", "ParityUser"),
        Predicate.BetweenExpr("age", Expr.Param("min_age"), Expr.Constant(VI64(65)))))
        .valueMap("externalId", "age")))
    assert(field(r.get("adults"), "externalId").toSet == Set("user-alice", "user-carol"))
  }
}
