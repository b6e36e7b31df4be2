package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Labeled-property-graph storage for the Spark engine.
  *
  * Layout decision (scale-first): ONE table per node label and per edge
  * label, instead of a single mega-table with a dynamic props map.
  * Rationale for 100 TB:
  *  - label filter == table/partition pruning (no scan of other labels);
  *  - each label keeps a concrete columnar schema, so Parquet min/max
  *    stats, dictionary encoding, predicate pushdown and column pruning
  *    all apply to user properties (a MAP<STRING,VARIANT> column would
  *    defeat all of them);
  *  - edge tables can be bucketed by `_src` (and a mirror by `_dst`) for
  *    shuffle-free adjacency joins on a real cluster.
  *
  * Reserved columns: `_id`, `_label` on nodes; plus `_src`, `_dst` on
  * edges (GraphFrames-style, cf. SURVEY.md §1.1). Reference virtual
  * fields `$id` / `$label` (dsl.rs:2948-2951) resolve to `_id`/`_label`.
  */
final case class EdgeMeta(srcLabels: Set[String], dstLabels: Set[String])

final class GraphStore(
    val spark: SparkSession,
    val nodeTables: Map[String, DataFrame],
    val edgeTables: Map[String, DataFrame],
    val edgeMeta: Map[String, EdgeMeta],
    val indexes: Set[graft.ast.IndexSpec] = Set.empty,
    /** Store identity for index-artifact caching: every DATA mutation
      * (withNodes/withEdges) mints a new version, so cached postings/IVF
      * artifacts can never be served for stale data. DDL-only changes
      * (withIndexes) keep the version — the data behind any existing
      * artifact is unchanged, so evicting it would only force rebuilds.
      */
    val version: String = GraphStore.newVersion(),
    /** Highest id ever allocated in this store, when known — the write
      * path seeds its id counter from `idHighWater + 1` instead of a
      * full-table `max(_id)` aggregation (a whole-corpus scan at
      * 100 TB). INVARIANT: when Some, it is >= every `_id` in every
      * table. Only the engine's own allocator (Compiler.idBase) stamps
      * it, post-allocation, so the invariant holds by induction; any
      * path that merges rows with EXTERNAL ids (streaming overlay) must
      * clear it. Persisted in graph_meta.json across save/load.
      */
    val idHighWater: Option[Long] = None) {

  def withNodes(label: String, df: DataFrame): GraphStore =
    new GraphStore(spark, nodeTables + (label -> df), edgeTables, edgeMeta,
      indexes, GraphStore.newVersion(), idHighWater)
  def withEdges(label: String, df: DataFrame, meta: Option[EdgeMeta] = None): GraphStore =
    new GraphStore(spark, nodeTables, edgeTables + (label -> df),
      meta.map(m => edgeMeta + (label -> m)).getOrElse(edgeMeta), indexes,
      GraphStore.newVersion(), idHighWater)
  def withIndexes(ix: Set[graft.ast.IndexSpec]): GraphStore =
    new GraphStore(spark, nodeTables, edgeTables, edgeMeta, ix, version, idHighWater)
  /** Stamp the durable id allocation mark (no data change — version kept). */
  def withIdHighWater(n: Long): GraphStore =
    new GraphStore(spark, nodeTables, edgeTables, edgeMeta, indexes, version, Some(n))
  /** Forget the allocation mark (rows with external ids were merged). */
  def clearIdHighWater: GraphStore =
    new GraphStore(spark, nodeTables, edgeTables, edgeMeta, indexes, version, None)

  /** Empty store bound to a session (write batches can build a graph
    * from scratch via AddN/AddE).
    */
  def this(spark: SparkSession) =
    this(spark, Map.empty, Map.empty, Map.empty)

  /** Expose the graph to Spark SQL: `nodes_<label>` / `edges_<label>`
    * temp views — `spark.sql("SELECT ... FROM nodes_Customer JOIN
    * edges_PLACED ON ...")` works alongside the traversal API.
    */
  def registerViews(prefix: String = ""): Unit = {
    nodeTables.foreach { case (l, df) => df.createOrReplaceTempView(s"${prefix}nodes_$l") }
    edgeTables.foreach { case (l, df) => df.createOrReplaceTempView(s"${prefix}edges_$l") }
  }

  /** All node labels that can be reached out of / into the given edge labels. */
  def nodeLabels: Set[String] = nodeTables.keySet
  def edgeLabels: Set[String] = edgeTables.keySet

  def nodesFor(label: String): DataFrame =
    nodeTables.getOrElse(label, sys.error(s"unknown node label: $label"))
  def edgesFor(label: String): DataFrame =
    edgeTables.getOrElse(label, sys.error(s"unknown edge label: $label"))

  /** Widen property columns whose type conflicts across labels to
    * string (dynamic property model: same name, per-label types) —
    * unionByName would otherwise coerce one side and corrupt or fail.
    */
  private def widenConflicts(dfs: Seq[DataFrame]): Seq[DataFrame] = {
    import org.apache.spark.sql.types.{DataType, StringType}
    val types = scala.collection.mutable.Map.empty[String, DataType]
    val conflicted = scala.collection.mutable.Set.empty[String]
    dfs.foreach(_.schema.fields.foreach { f =>
      types.get(f.name) match {
        case None => types(f.name) = f.dataType
        case Some(t) if t == f.dataType => ()
        case Some(_) => conflicted += f.name
      }
    })
    if (conflicted.isEmpty) dfs
    else dfs.map { df =>
      val hit = df.schema.fields.filter(f =>
        conflicted.contains(f.name) && f.dataType != StringType)
      hit.foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast(StringType)))
    }
  }

  /** Union of the given labels' node tables, schema-merged (missing props null). */
  def nodesUnion(labels: Set[String]): DataFrame = {
    val dfs = labels.toSeq.sorted.map(nodesFor)
    require(dfs.nonEmpty, "empty label set")
    widenConflicts(dfs).reduce(_.unionByName(_, allowMissingColumns = true))
  }
  def allNodes: DataFrame = nodesUnion(nodeTables.keySet)

  def edgesUnion(labels: Set[String]): DataFrame = {
    val dfs = labels.toSeq.sorted.map(edgesFor)
    require(dfs.nonEmpty, "empty edge label set")
    widenConflicts(dfs).reduce(_.unionByName(_, allowMissingColumns = true))
  }
  def allEdges: DataFrame = edgesUnion(edgeTables.keySet)

  /** Labels an edge set can end at (for pruning the node-join target). */
  def dstLabelsOf(edgeLabels: Set[String]): Set[String] =
    edgeLabels.flatMap(l => edgeMeta.get(l).map(_.dstLabels).getOrElse(nodeTables.keySet))
  def srcLabelsOf(edgeLabels: Set[String]): Set[String] =
    edgeLabels.flatMap(l => edgeMeta.get(l).map(_.srcLabels).getOrElse(nodeTables.keySet))

  /** Edge labels whose source (resp. dest) can be one of `labels`. */
  def outEdgeLabels(labels: Option[Set[String]]): Set[String] = labels match {
    case None => edgeTables.keySet
    case Some(ls) => edgeTables.keySet.filter(e =>
      edgeMeta.get(e).forall(_.srcLabels.exists(ls.contains)))
  }
  def inEdgeLabels(labels: Option[Set[String]]): Set[String] = labels match {
    case None => edgeTables.keySet
    case Some(ls) => edgeTables.keySet.filter(e =>
      edgeMeta.get(e).forall(_.dstLabels.exists(ls.contains)))
  }
}

object GraphStore {
  def newVersion(): String = java.util.UUID.randomUUID().toString
}

/** Builds the graph projection of the driver's TPC-H-ish testdata
  * (see /root/repo/FIXTURES.md §B). Original column names are kept as
  * property names so DuckDB-oracle SQL reads naturally off the raw
  * parquet tables.
  *
  * Global id scheme: ids are disjoint per label via a band offset
  * (`band * 1e9 + natural key`). Deterministic, join-free, and
  * reproducible in plain SQL on the oracle side. (A production deploy
  * at 100 TB would widen the band arithmetic; the scheme itself —
  * label-banded ids derived from natural keys, never a global counter —
  * is the scale-safe part.)
  */
object TestGraph {
  val OFF = 1000000000L
  // node bands
  val RegionB = 1L; val NationB = 2L; val CustomerB = 3L; val SupplierB = 4L
  val PartB = 5L; val OrderB = 6L; val LineitemB = 7L; val EventB = 8L
  val DocumentB = 9L; val EmbeddingB = 10L
  /** Lineitem ids are content-hashed (no unique natural key); they live
    * in their own high band well above the arithmetic bands.
    */
  val LineitemHashBand = 100000000000000000L // 1e17
  // edge bands start at 20
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, GraphStore]()

  def apply(spark: SparkSession, dir: String): GraphStore =
    cache.computeIfAbsent(dir + "@" + System.identityHashCode(spark), _ => build(spark, dir))

  private def pq(spark: SparkSession, dir: String, t: String): DataFrame =
    spark.read.parquet(s"$dir/$t.parquet")

  def build(spark: SparkSession, dir: String): GraphStore = {
    // events.parquet carries TIMESTAMP(NANOS) which vanilla Spark refuses;
    // read nanos as long and convert to a proper timestamp column below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def node(df: DataFrame, label: String, idCol: org.apache.spark.sql.Column): DataFrame =
      df.withColumn("_id", idCol.cast("long")).withColumn("_label", lit(label))

    val region   = pq(spark, dir, "region")
    val nation   = pq(spark, dir, "nation")
    val customer = pq(spark, dir, "customer")
    val supplier = pq(spark, dir, "supplier")
    val part     = pq(spark, dir, "part")
    val orders   = pq(spark, dir, "orders")
    val lineitem = pq(spark, dir, "lineitem")
    val events0  = pq(spark, dir, "events")
    // normalize ts to µs TimestampType from either physical shape:
    // TIMESTAMP(NANOS) read as long under nanosAsLong (integer DIV —
    // a double division rounds within ±1 µs at epoch-nanos magnitude,
    // matching the oracle's ns->µs truncation), or
    // TIMESTAMP(MICROS, isAdjustedToUTC=0) read as TIMESTAMP_NTZ
    // (cast interprets the wall clock in the session tz — UTC in graft)
    val events = events0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        events0.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        events0.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => events0
    }
    val documents  = pq(spark, dir, "documents")
    val embeddings = pq(spark, dir, "embeddings")

    // lineitem has NO unique natural key in this synthetic data (dup
    // (orderkey, linenumber) pairs) but the full row IS unique, so use a
    // content-addressed id: 56-bit md5 of all columns, offset into its
    // own band. Fully parallel (no global sort/counter — the pattern
    // that survives 100 TB), deterministic, and reproducible in oracle
    // SQL. Collision odds at 600k rows: ~2.5e-6.
    // (orderkey, linenumber, partkey, suppkey, quantity) is unique at
    // every SF — the minimal (cheapest-to-hash) distinguishing key
    val liKey = concat_ws("|",
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
      col("l_quantity"))
    // cache the id-stamped frame: one parallel materialization instead
    // of re-hashing on every scan (lineitem backs 3 edge tables + nodes).
    // The parquet is a single ~40MB split, so spread it across the
    // cluster first — otherwise every downstream scan-side stage runs
    // on one core.
    val lineitemR = lineitem
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("_rn",
        lit(LineitemHashBand) + conv(substring(md5(liKey), 1, 14), 16, 10).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val liId = col("_rn")

    val nodes = Map(
      "Region"    -> node(region, "Region", lit(RegionB * OFF) + col("r_regionkey")),
      "Nation"    -> node(nation, "Nation", lit(NationB * OFF) + col("n_nationkey")),
      "Customer"  -> node(customer, "Customer", lit(CustomerB * OFF) + col("c_custkey")),
      "Supplier"  -> node(supplier, "Supplier", lit(SupplierB * OFF) + col("s_suppkey")),
      "Part"      -> node(part, "Part", lit(PartB * OFF) + col("p_partkey")),
      "Order"     -> node(orders, "Order", lit(OrderB * OFF) + col("o_orderkey")),
      "Lineitem"  -> node(lineitemR, "Lineitem", liId).drop("_rn"),
      "Event"     -> node(events, "Event", lit(EventB * OFF) + col("event_id")),
      "Document"  -> node(documents, "Document", lit(DocumentB * OFF) + col("doc_id")),
      "Embedding" -> node(embeddings, "Embedding", lit(EmbeddingB * OFF) + col("vec_id")),
    )

    def edge(df: DataFrame, label: String, band: Long,
             eid: org.apache.spark.sql.Column,
             src: org.apache.spark.sql.Column, dst: org.apache.spark.sql.Column,
             props: Seq[(String, org.apache.spark.sql.Column)] = Nil): DataFrame = {
      val base = df.select(
        Seq((lit(band * OFF) + eid).cast("long").as("_id"), lit(label).as("_label"),
            src.cast("long").as("_src"), dst.cast("long").as("_dst")) ++
          props.map { case (n, c) => c.as(n) }: _*)
      base
    }

    val fromNation = edge(customer, "FROM_NATION", 21L, col("c_custkey"),
        lit(CustomerB * OFF) + col("c_custkey"), lit(NationB * OFF) + col("c_nationkey"))
      .unionByName(edge(supplier, "FROM_NATION", 22L, col("s_suppkey"),
        lit(SupplierB * OFF) + col("s_suppkey"), lit(NationB * OFF) + col("s_nationkey")))

    val edges = Map(
      "IN_REGION" -> edge(nation, "IN_REGION", 20L, col("n_nationkey"),
        lit(NationB * OFF) + col("n_nationkey"), lit(RegionB * OFF) + col("n_regionkey")),
      "FROM_NATION" -> fromNation,
      "PLACED" -> edge(orders, "PLACED", 23L, col("o_orderkey"),
        lit(CustomerB * OFF) + col("o_custkey"), lit(OrderB * OFF) + col("o_orderkey")),
      // CONTAINS carries a couple of edge properties to exercise
      // edge-stream filters/sorts (EdgeHas, edge_properties, order_by).
      // lineitem-derived edges inherit the content hash; each label gets
      // its own high band so edge ids stay globally unique
      "CONTAINS" -> edge(lineitemR, "CONTAINS", 0L,
        liId - lit(LineitemHashBand) + lit(2L * LineitemHashBand),
        lit(OrderB * OFF) + col("l_orderkey"), liId,
        Seq("l_quantity" -> col("l_quantity"), "l_linenumber" -> col("l_linenumber"))),
      "OF_PART" -> edge(lineitemR, "OF_PART", 0L,
        liId - lit(LineitemHashBand) + lit(3L * LineitemHashBand),
        liId, lit(PartB * OFF) + col("l_partkey")),
      "SUPPLIED_BY" -> edge(lineitemR, "SUPPLIED_BY", 0L,
        liId - lit(LineitemHashBand) + lit(4L * LineitemHashBand),
        liId, lit(SupplierB * OFF) + col("l_suppkey")),
      "BY_CUSTOMER" -> edge(events, "BY_CUSTOMER", 27L, col("event_id"),
        lit(EventB * OFF) + col("event_id"), lit(CustomerB * OFF) + col("user_id")),
    )

    val meta = Map(
      "IN_REGION"   -> EdgeMeta(Set("Nation"), Set("Region")),
      "FROM_NATION" -> EdgeMeta(Set("Customer", "Supplier"), Set("Nation")),
      "PLACED"      -> EdgeMeta(Set("Customer"), Set("Order")),
      "CONTAINS"    -> EdgeMeta(Set("Order"), Set("Lineitem")),
      "OF_PART"     -> EdgeMeta(Set("Lineitem"), Set("Part")),
      "SUPPLIED_BY" -> EdgeMeta(Set("Lineitem"), Set("Supplier")),
      "BY_CUSTOMER" -> EdgeMeta(Set("Event"), Set("Customer")),
    )

    // Document.text carries a declared BM25 index (the reference's
    // default-on text index, config.rs:174-175): queries serve from the
    // cached postings artifact — built once per store, the write-time
    // artifact shape that holds at 100 TB — instead of re-tokenizing
    // the corpus per query. Vector indexes stay undeclared so
    // vector-search parity queries stay oracle-exact brute scans.
    new GraphStore(spark, nodes, edges, meta).withIndexes(Set(
      graft.ast.IndexSpec.NodeText("Document", "text", None)))
  }
}
