package graft.search

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ast.IndexSpec
import graft.model.GraphStore

/** Durable index artifacts: the batch-built equivalents of the
  * reference's always-on HNSW/BM25 index files (config.rs:166-209),
  * persisted as parquet tables next to the graph
  * (`root/_index/text/<label>/<prop>/…`, `root/_index/ivf/<label>/<prop>`).
  *
  * At 100 TB these are produced by the WRITE path (a nightly or
  * incremental index build job), and query serving only ever reads
  * them — `load` pre-populates the serving cache so the first query
  * after a restart pays zero build cost.
  */
object IndexArtifacts {

  def save(store: GraphStore, root: String): Unit = {
    store.indexes.foreach {
      case IndexSpec.NodeText(l, p, t) if store.nodeTables.contains(l) =>
        saveText(store, store.nodesFor(l).sparkSession, l, p, isEdges = false, root, t)
      case IndexSpec.EdgeText(l, p, t) if store.edgeTables.contains(l) =>
        saveText(store, store.edgesFor(l).sparkSession, l, p, isEdges = true, root, t)
      case IndexSpec.NodeVector(l, p, t) if store.nodeTables.contains(l) =>
        saveIvf(store, l, p, isEdges = false, root, t)
        savePq(store, l, p, isEdges = false, root, t)
      case IndexSpec.EdgeVector(l, p, t) if store.edgeTables.contains(l) =>
        saveIvf(store, l, p, isEdges = true, root, t)
        savePq(store, l, p, isEdges = true, root, t)
      case _ => ()
    }
  }

  private def saveText(store: GraphStore, spark: SparkSession, label: String,
      prop: String, isEdges: Boolean, root: String,
      tenantCol: Option[String] = None): Unit = {
    val table = if (isEdges) store.edgesFor(label) else store.nodesFor(label)
    val (post, stats) = BM25.buildIndex(table, prop, tenantCol)
    // postings bucketed by term hash: a query's term lookup prunes to
    // its buckets (partitionBy("_term") would explode the namespace)
    post.withColumn("_tb", pmod(hash(col("_term")), lit(64)))
      .repartition(col("_tb"))
      .write.mode(SaveMode.Overwrite).partitionBy("_tb")
      .parquet(s"$root/_index/text/$label/$prop/postings")
    stats.write.mode(SaveMode.Overwrite)
      .parquet(s"$root/_index/text/$label/$prop/stats")
  }

  /** For a tenant-partitioned index (tenant_property declared), one
    * centroid set PER TENANT whose corpus clears the IVF serving
    * threshold — smaller tenants serve exact brute scans anyway, so a
    * centroid artifact for them would never be read. The driver loop is
    * bounded by the number of above-threshold tenants (each holding
    * >= threshold rows, so at most corpus/threshold of them).
    */
  private def saveIvf(store: GraphStore, label: String, prop: String,
      isEdges: Boolean, root: String, tenantCol: Option[String] = None): Unit = {
    val table = if (isEdges) store.edgesFor(label) else store.nodesFor(label)
    val spark = table.sparkSession
    import spark.implicits._
    val path = s"$root/_index/ivf/$label/$prop"
    tenantCol match {
      case None =>
        val n = table.count()
        val nlist = math.max(16, math.min(4096, math.sqrt(n.toDouble).toInt))
        val model = VectorOps.trainIvf(table, prop, nlist)
        model.centroids.zipWithIndex
          .map { case (c, i) => (i, c.toSeq) }.toSeq
          .toDF("centroid_id", "centroid")
          .write.mode(SaveMode.Overwrite).parquet(path)
      case Some(tp) =>
        val threshold =
          spark.conf.get("graft.search.ivfThreshold", "100000").toLong
        val bigTenants = table.groupBy(col(tp)).count()
          .where(col("count") >= threshold).collect()
        val rows = bigTenants.toSeq.flatMap { r =>
          val tv = r.get(0)
          val n = r.getLong(1)
          val nlist = math.max(16, math.min(4096, math.sqrt(n.toDouble).toInt))
          val model = VectorOps.trainIvf(table.where(col(tp) === tv), prop, nlist)
          model.centroids.zipWithIndex.map { case (c, i) =>
            (String.valueOf(tv), i, c.toSeq)
          }
        }
        rows.toDF("_tenant", "centroid_id", "centroid")
          .write.mode(SaveMode.Overwrite).parquet(path)
    }
  }

  /** PQ codebooks for the IVF-PQ serving tier. Only the CODEBOOKS
    * persist — at 100 TB the code column itself is part of the stored
    * table (written at ingest); rebuilding it from durable codebooks
    * is one scan, never a re-train. Rows: (subspace, centroid_id,
    * centroid), plus `_tenant` for tenant-partitioned indexes (one
    * codebook set per above-threshold tenant, like saveIvf).
    * Vector dims indivisible by `graft.search.pqM` save nothing — the
    * serving path falls back to plain IVF for them anyway.
    */
  private def savePq(store: GraphStore, label: String, prop: String,
      isEdges: Boolean, root: String, tenantCol: Option[String] = None): Unit = {
    val table = if (isEdges) store.edgesFor(label) else store.nodesFor(label)
    val spark = table.sparkSession
    import spark.implicits._
    val m = spark.conf.get("graft.search.pqM", "8").toInt
    val dimRow = table.select(size(col(prop))).head()
    if (dimRow.isNullAt(0) || dimRow.getInt(0) % m != 0) return
    val path = s"$root/_index/pq/$label/$prop"
    tenantCol match {
      case None =>
        val model = VectorOps.trainPq(table, prop, m)
        model.codebooks.toSeq.zipWithIndex.flatMap { case (cb, s) =>
          cb.toSeq.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
        }.toDF("subspace", "centroid_id", "centroid")
          .write.mode(SaveMode.Overwrite).parquet(path)
      case Some(tp) =>
        val threshold =
          spark.conf.get("graft.search.ivfThreshold", "100000").toLong
        val bigTenants = table.groupBy(col(tp)).count()
          .where(col("count") >= threshold).collect()
        if (bigTenants.isEmpty) return
        val rows = bigTenants.toSeq.flatMap { r =>
          val tv = r.get(0)
          val model = VectorOps.trainPq(table.where(col(tp) === tv), prop, m)
          model.codebooks.toSeq.zipWithIndex.flatMap { case (cb, s) =>
            cb.toSeq.zipWithIndex.map { case (c, i) =>
              (String.valueOf(tv), s, i, c.toSeq)
            }
          }
        }
        rows.toDF("_tenant", "subspace", "centroid_id", "centroid")
          .write.mode(SaveMode.Overwrite).parquet(path)
    }
  }

  /** Load persisted artifacts for `store` (matching its DECLARED
    * indexes) into the serving cache under the store's version. Returns
    * the number of artifacts loaded; missing artifacts are skipped
    * (they build lazily on first query as usual).
    */
  def load(spark: SparkSession, root: String, store: GraphStore): Int = {
    var loaded = 0
    def exists(p: String) = new java.io.File(p).isDirectory
    store.indexes.foreach {
      case IndexSpec.NodeText(l, p, _) if exists(s"$root/_index/text/$l/$p/postings") =>
        val post = spark.read.parquet(s"$root/_index/text/$l/$p/postings").drop("_tb")
        val stats = spark.read.parquet(s"$root/_index/text/$l/$p/stats")
        IndexCache.putText(store.version, l, p, post, stats)
        loaded += 1
      case IndexSpec.EdgeText(l, p, _) if exists(s"$root/_index/text/$l/$p/postings") =>
        val post = spark.read.parquet(s"$root/_index/text/$l/$p/postings").drop("_tb")
        val stats = spark.read.parquet(s"$root/_index/text/$l/$p/stats")
        IndexCache.putText(store.version, l, p, post, stats)
        loaded += 1
      case IndexSpec.NodeVector(l, p, t) if exists(s"$root/_index/ivf/$l/$p") =>
        loaded += loadIvf(spark, s"$root/_index/ivf/$l/$p", store.version, l, p, t)
        if (exists(s"$root/_index/pq/$l/$p"))
          loaded += loadPq(spark, s"$root/_index/pq/$l/$p", store.version, l, p, t)
      case IndexSpec.EdgeVector(l, p, t) if exists(s"$root/_index/ivf/$l/$p") =>
        loaded += loadIvf(spark, s"$root/_index/ivf/$l/$p", store.version, l, p, t)
        if (exists(s"$root/_index/pq/$l/$p"))
          loaded += loadPq(spark, s"$root/_index/pq/$l/$p", store.version, l, p, t)
      case _ => ()
    }
    loaded
  }

  private def loadIvf(spark: SparkSession, path: String, version: String,
      label: String, prop: String, tenantCol: Option[String]): Int =
    tenantCol match {
      case None =>
        IndexCache.putIvf(version, label, prop, readIvf(spark, path))
        1
      case Some(_) =>
        // per-tenant models: rows are (tenant, centroid_id, centroid);
        // the collect is bounded by (above-threshold tenants) × nlist
        val rows = spark.read.parquet(path)
          .orderBy("_tenant", "centroid_id").collect()
        val byTenant = rows.groupBy(_.getString(0))
        byTenant.foreach { case (tv, rs) =>
          IndexCache.putIvf(version, label, IndexCache.tenantKey(prop, tv),
            VectorOps.IvfModel(rs.map(_.getSeq[Double](2).toArray)))
        }
        byTenant.size
    }

  private def readIvf(spark: SparkSession, path: String): VectorOps.IvfModel = {
    val rows = spark.read.parquet(path).orderBy("centroid_id").collect()
    VectorOps.IvfModel(rows.map(_.getSeq[Double](1).toArray))
  }

  private def pqFromRows(
      rows: Array[(Int, Int, Array[Double])]): VectorOps.PqModel = {
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_._2).map(_._3) }.toArray
    VectorOps.PqModel(books(0)(0).length, books)
  }

  private def loadPq(spark: SparkSession, path: String, version: String,
      label: String, prop: String, tenantCol: Option[String]): Int =
    tenantCol match {
      case None =>
        val rows = spark.read.parquet(path)
          .orderBy("subspace", "centroid_id").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        IndexCache.putPq(version, label, prop, pqFromRows(rows))
        1
      case Some(_) =>
        val rows = spark.read.parquet(path)
          .orderBy("_tenant", "subspace", "centroid_id").collect()
        val byTenant = rows.groupBy(_.getString(0))
        byTenant.foreach { case (tv, rs) =>
          IndexCache.putPq(version, label, IndexCache.tenantKey(prop, tv),
            pqFromRows(rs.map(r =>
              (r.getInt(1), r.getInt(2), r.getSeq[Double](3).toArray))))
        }
        byTenant.size
    }
}
