package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over plain edge frames — the analysis
  * layer a property-graph engine owes its users beyond traversal:
  * bipartite co-occurrence projection, degrees, connected components,
  * and triangle counting. Everything is DataFrame aggregations and
  * equi-joins (no driver-side iteration over vertices), so each
  * operator's cost envelope is the shuffles it names.
  *
  * Edge frames are UNDIRECTED and canonical: columns `(id_a, id_b)`
  * with `id_a < id_b`, one row per edge — the same shape the dedup
  * pair generators emit, so near-dup pair output plugs directly into
  * [[connectedComponents]] / [[triangleCounts]].
  */
object GraphAlgos {

  /** Project a bipartite `(group, item)` relation onto item-item
    * co-occurrence edges: one `(id_a, id_b)` row (with `id_a < id_b`)
    * per unordered item pair sharing at least one group — "orders
    * linked by a common part", "docs linked by a common shingle".
    *
    * Pair generation routes through the bounded-block primitive
    * ([[Dedup.boundedKeyPairs]]): a group with more than `cap` items
    * pair-explodes in sub-blocks with bounded per-task memory, so one
    * pathological group cannot OOM an executor. The projection of a
    * group is quadratic in its size by DEFINITION — at 100 TB, cap
    * the group size upstream (cf. shingle df-caps) or expect |group|²
    * output rows; `maxGroupSize` drops larger groups outright (the
    * standard stop-word discipline for co-occurrence graphs).
    */
  def coOccurrence(df: DataFrame, groupCol: String, itemCol: String,
      maxGroupSize: Int = Int.MaxValue): DataFrame =
    Dedup.boundedKeyPairs(
      df.select(col(groupCol).as("_g"), col(itemCol).as("_it")).distinct(),
      Seq("_g"), "_it", maxKeyDf = maxGroupSize)
      .select("id_a", "id_b").distinct()

  /** Per-vertex degree over a canonical undirected edge frame. One
    * aggregation; vertices with no edges don't appear (join the node
    * table with a zero-fill if isolated vertices matter).
    */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("id_a").as("node_id"))
      .unionAll(edges.select(col("id_b").as("node_id")))
      .groupBy("node_id").agg(count(lit(1)).as("degree"))

  /** Connected components: `(node_id, component_id)` with the
    * component labeled by its minimum member id. Delegates to the
    * alternating large-star/small-star rounds ([[Dedup.dupClustersStar]],
    * Kiveris et al.) — O(log n) rounds regardless of component
    * diameter, per-round frames through the reliable iterative-pass
    * store — because a graph's components, unlike a dedup corpus's
    * near-dup clusters, routinely have long chains.
    */
  def connectedComponents(edges: DataFrame): DataFrame =
    Dedup.dupClustersStar(edges)
      .select(col("doc_id").as("node_id"), col("cluster_id").as("component_id"))

  /** Per-vertex triangle participation counts: `(node_id, triangles)`
    * — how many triangles each vertex is a corner of. Vertices in no
    * triangle don't appear.
    *
    * The classic degree-ordered formulation (the MapReduce triangle
    * algorithm of Suri & Vassilvitskii): orient every undirected edge
    * from its lower-(degree, id) endpoint to its higher one — a DAG in
    * which each triangle closes exactly once — then join out-edges
    * with out-edges to enumerate wedges and close them against the
    * oriented edge set. Degree ordering bounds each vertex's out-degree
    * by O(√m), so the wedge intermediate is O(m^1.5) worst case — the
    * known optimum for exact listing — instead of Σ deg² of a naive
    * orientation (a celebrity vertex squares its degree otherwise).
    * Three shuffles total: degree agg, wedge join, closure join.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    val withDeg = edges
      .join(deg.select(col("node_id").as("id_a"), col("degree").as("_da")), "id_a")
      .join(deg.select(col("node_id").as("id_b"), col("degree").as("_db")), "id_b")
    // rank = (degree, id), compared lexicographically as a struct
    val lowFirst = col("_da") < col("_db") ||
      (col("_da") === col("_db") && col("id_a") < col("id_b"))
    val oriented = withDeg.select(
      when(lowFirst, col("id_a")).otherwise(col("id_b")).as("_lo"),
      when(lowFirst, struct(col("_db").as("d"), col("id_b").as("i")))
        .otherwise(struct(col("_da").as("d"), col("id_a").as("i"))).as("_hiK"))
      .select(col("_lo"), col("_hiK"), col("_hiK").getField("i").as("_hi"))
    // wedges at _lo: unordered out-neighbor pairs, ranked v < w
    val w1 = oriented.select(col("_lo"), col("_hiK").as("_vK"), col("_hi").as("_v"))
    val w2 = oriented.select(col("_lo"), col("_hiK").as("_wK"), col("_hi").as("_w"))
    val wedges = w1.join(w2, Seq("_lo")).where(col("_vK") < col("_wK"))
      .select(col("_lo"), col("_v"), col("_w"))
    // close the wedge: an oriented edge _v -> _w must exist
    val closing = oriented.select(col("_lo").as("_v"), col("_hi").as("_w"))
    val tris = wedges.join(closing, Seq("_v", "_w"))
    tris.select(col("_lo").as("node_id"))
      .unionAll(tris.select(col("_v").as("node_id")))
      .unionAll(tris.select(col("_w").as("node_id")))
      .groupBy("node_id").agg(count(lit(1)).as("triangles"))
  }
}
