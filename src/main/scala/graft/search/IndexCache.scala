package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import java.util.concurrent.ConcurrentHashMap

/** Session-lived artifacts behind declared indexes (SURVEY §4.1: the
  * vector/text index DDL maps to batch index artifacts, not B-trees).
  * Keyed by store identity, so any mutation (which produces a new
  * GraphStore) naturally invalidates.
  */
object IndexCache {
  private val text =
    new ConcurrentHashMap[(Int, String, String), (DataFrame, DataFrame)]()
  private val ivf =
    new ConcurrentHashMap[(Int, String, String), VectorOps.IvfModel]()

  /** Postings + corpus stats for a declared text index, built once per
    * (store, label, property) and cached persisted.
    */
  def textIndex(storeId: Int, label: String, prop: String,
      table: => DataFrame): (DataFrame, DataFrame) =
    text.computeIfAbsent((storeId, label, prop), _ => {
      val (post, stats) = BM25.buildIndex(table, prop)
      val p = post.persist(StorageLevel.MEMORY_AND_DISK)
      val s = stats.persist(StorageLevel.MEMORY_AND_DISK)
      p.count(); s.count()
      (p, s)
    })

  /** IVF centroids for a declared vector index. */
  def ivfModel(storeId: Int, label: String, prop: String, nlist: Int,
      table: => DataFrame): VectorOps.IvfModel =
    ivf.computeIfAbsent((storeId, label, prop), _ =>
      VectorOps.trainIvf(table, prop, nlist))
}
