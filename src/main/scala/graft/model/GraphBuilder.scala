package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bulk-load builder: project arbitrary (e.g. Parquet) tables into the
  * engine's graph layout. The reference ingests rows one AddN at a time
  * over HTTP; at 100 TB data arrives as columnar tables, so this is the
  * front door (SURVEY §2.1 "sinks" note, §7.8).
  *
  * {{{
  * val store = GraphBuilder(spark)
  *   .nodes("User", users, col("user_id"))
  *   .nodes("Item", items, col("item_id"))
  *   .edges("BOUGHT", orders, col("order_id"), "User" -> col("user_id"),
  *     "Item" -> col("item_id"), props = Seq("qty"))
  *   .build()
  * }}}
  *
  * Ids are caller-supplied columns; use disjoint ranges or content
  * hashes per label (see TestGraph for both patterns).
  */
final case class GraphBuilder(
    spark: org.apache.spark.sql.SparkSession,
    nodeTables: Map[String, DataFrame] = Map.empty,
    edgeTables: Map[String, DataFrame] = Map.empty,
    edgeMeta: Map[String, EdgeMeta] = Map.empty) {

  def nodes(label: String, df: DataFrame, id: Column): GraphBuilder =
    copy(nodeTables = nodeTables + (label ->
      df.withColumn("_id", id.cast("long")).withColumn("_label", lit(label))))

  /** Edge table from a source table: `src`/`dst` give the endpoint ids;
    * srcLabel/dstLabel feed the planner's reachability metadata.
    */
  def edges(label: String, df: DataFrame, id: Column,
      src: (String, Column), dst: (String, Column),
      props: Seq[String] = Nil): GraphBuilder = {
    val base = df.select(
      Seq(id.cast("long").as("_id"), lit(label).as("_label"),
        src._2.cast("long").as("_src"), dst._2.cast("long").as("_dst")) ++
        props.map(col): _*)
    val meta = edgeMeta.get(label)
      .map(m => EdgeMeta(m.srcLabels + src._1, m.dstLabels + dst._1))
      .getOrElse(EdgeMeta(Set(src._1), Set(dst._1)))
    copy(
      edgeTables = edgeTables + (label ->
        edgeTables.get(label).map(_.unionByName(base)).getOrElse(base)),
      edgeMeta = edgeMeta + (label -> meta))
  }

  def build(): GraphStore = new GraphStore(spark, nodeTables, edgeTables, edgeMeta)
}
