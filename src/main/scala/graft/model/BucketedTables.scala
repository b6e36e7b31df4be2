package graft.model

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hash-bucketed table layout — the write-once co-location contract
  * that deletes the per-query shuffle from every later join or
  * aggregation on the bucket key.
  *
  * The streaming ingest layout (`GraphStream.nodeIngest`) directory-
  * partitions by a hash bucket, which prunes SCANS; it does not tell
  * Catalyst anything about row placement, so joins still exchange both
  * sides. This sink writes through the catalog with `bucketBy` +
  * `sortBy`, so the table's hash distribution and sort order are plan
  * facts: two tables bucketed by their join key with the SAME bucket
  * count sort-merge-join with ZERO exchanges (and zero per-partition
  * sorts — the on-disk order is the merge order), and a groupBy on the
  * bucket key aggregates exchange-free.
  *
  * At 100 TB the arithmetic is decisive: a fact table joined on the
  * same key by every query in a fleet pays ONE bucketed write, after
  * which each join skips shuffling that table entirely — on a
  * 1000-executor cluster that is the difference between re-wiring
  * 100 TB through the network per query and streaming co-located
  * bucket pairs. Pick the bucket count once per subject area (all
  * tables sharing a join key must agree on it) and size buckets to
  * executor memory: `buckets >= table_bytes / target_partition_bytes`.
  *
  * Tables are written as EXTERNAL parquet (caller owns `path`), so the
  * files outlive the catalog entry and a fresh session re-registers
  * them cheaply.
  */
object BucketedTables {

  /** Write `df` as an external bucketed+sorted parquet table. The
    * table is registered in the session catalog under `table` (any
    * existing entry is replaced) with files under `path`.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      keyCol: String, buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)
  }

  /** Re-register an existing bucketed table written by
    * [[writeBucketed]] into a fresh session's catalog (the files are
    * external; only the catalog entry is session-scoped). The layout
    * args must match the original write — bucketing is a metadata
    * contract, and a wrong `buckets` here would silently plan
    * mis-co-located joins.
    */
  def register(spark: SparkSession, table: String, path: String,
      keyCol: String, buckets: Int, schemaDdl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(
      s"CREATE TABLE `$table` ($schemaDdl) USING parquet " +
        s"CLUSTERED BY (`$keyCol`) SORTED BY (`$keyCol`) " +
        s"INTO $buckets BUCKETS LOCATION '$path'")
  }

  /** The catalog-backed frame for a bucketed table — joins and
    * aggregations on the bucket key plan exchange-free against other
    * tables of the same bucket count.
    */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
