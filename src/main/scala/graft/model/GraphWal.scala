package graft.model

import org.apache.spark.sql.SparkSession

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory

import graft.ast.{Batch, Json, PropertyValue}
import graft.exec.BatchExecutor

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Incremental write durability: an append-only segment log + manifest
  * next to the GraphPersistence snapshot, so write batches commit one
  * segment at a time instead of re-saving whole tables (the reference
  * cloud is object-storage-backed with ACID commits, README.md:221;
  * `x-helix-await-durable` acks a durable write, lib.rs:270-298).
  *
  * This is a LOGICAL log: each segment is one committed write batch
  * (wire-codec JSON + parameters), and recovery replays segments over
  * the snapshot through the same BatchExecutor that ran them live.
  * Replay is deterministic — id allocation seeds from max(_id)+1 of
  * the store state each batch sees (Compiler.idBase), which replay
  * reproduces exactly — so ids, properties, and declared indexes come
  * back bit-identical without ever writing a table delta. Logging a
  * batch is O(batch text); a physical delta log would pay a Spark
  * write job per commit.
  *
  * Layout under `root`:
  *   `snap-<k>/…`         immutable full snapshots (GraphPersistence
  *                        layout), one per checkpoint — versioned so a
  *                        checkpoint never overwrites parquet the live
  *                        store's plans are still reading;
  *   `wal/seg-<n>.json`   one write batch per file, append-only;
  *   `wal/MANIFEST.json`  `{"snapshot": "snap-<k>", "applied":
  *                        ["seg-1.json", …]}` — replaced atomically
  *                        (tmp + ATOMIC_MOVE), so a crash mid-commit
  *                        leaves the previous manifest and the
  *                        half-written segment is simply ignored.
  *
  * `checkpoint` folds the log into the next snapshot and truncates the
  * manifest — the standard compaction step that bounds replay cost
  * (run it on a cadence; every segment since the last checkpoint
  * replays on recovery). Superseded snapshot dirs are left for an
  * external GC once no live reader references them (same discipline as
  * any MVCC table format).
  */
object GraphWal {
  private val mapper = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  private def walDir(root: String): Path = Paths.get(root, "wal")
  private def manifestPath(root: String): Path = walDir(root).resolve("MANIFEST.json")

  /** (current snapshot dir name, applied segment files). */
  private def readManifest(root: String): (Option[String], Seq[String]) = {
    val p = manifestPath(root)
    if (!Files.exists(p)) (None, Nil)
    else {
      val tree = mapper.readTree(Files.readString(p))
      val snap = Option(tree.get("snapshot")).filterNot(_.isNull).map(_.asText)
      val applied = Option(tree.get("applied"))
        .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Nil)
      (snap, applied)
    }
  }

  private def writeManifest(root: String, snapshot: Option[String],
      applied: Seq[String]): Unit = {
    val arr = F.arrayNode(); applied.foreach(arr.add)
    val obj = F.objectNode()
    snapshot.foreach(obj.put("snapshot", _))
    obj.set[com.fasterxml.jackson.databind.JsonNode]("applied", arr)
    val tmp = walDir(root).resolve("MANIFEST.tmp")
    Files.writeString(tmp, mapper.writeValueAsString(obj))
    try Files.move(tmp, manifestPath(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, manifestPath(root), StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Durably commit one write batch: segment file first, then the
    * manifest flips atomically. Call under the caller's write lock
    * (the Gateway's), in commit order.
    */
  def logWrite(root: String, batch: Batch,
      params: Map[String, PropertyValue]): Unit = synchronized {
    Files.createDirectories(walDir(root))
    val (snap, applied) = readManifest(root)
    val name = s"seg-${applied.size + 1}.json"
    val seg = F.objectNode()
    val pn = F.objectNode()
    params.toSeq.sortBy(_._1).foreach { case (k, v) =>
      pn.set[com.fasterxml.jackson.databind.JsonNode](k, Json.writeValue(v))
    }
    seg.set[com.fasterxml.jackson.databind.JsonNode]("parameters", pn)
    seg.set[com.fasterxml.jackson.databind.JsonNode]("batch", Json.writeBatchObj(batch))
    Files.writeString(walDir(root).resolve(name), mapper.writeValueAsString(seg))
    writeManifest(root, snap, applied :+ name)
  }

  /** Load the manifest's snapshot and replay every committed segment in
    * order. Returns the recovered store (ids/indexes identical to the
    * pre-crash live store).
    */
  def recover(spark: SparkSession, root: String): GraphStore = {
    val (snap, applied) = readManifest(root)
    var store = GraphPersistence.load(spark,
      snap.map(s => s"$root/$s").getOrElse(root))
    applied.foreach { name =>
      val tree = mapper.readTree(Files.readString(walDir(root).resolve(name)))
      val params = Option(tree.get("parameters")).map { pn =>
        pn.properties.asScala.map(e => e.getKey -> Json.readValue(e.getValue)).toMap
      }.getOrElse(Map.empty[String, PropertyValue])
      val batch = Json.readBatchObj(tree.get("batch"), write = true)
      store = new BatchExecutor(store, params).execute(batch).store
    }
    store
  }

  /** Fold the current state into the NEXT snapshot dir, then truncate
    * the log — the store may hold plans reading the previous snapshot's
    * parquet, so the save never targets a directory being read.
    */
  def checkpoint(store: GraphStore, root: String): Unit = synchronized {
    val (snap, applied) = readManifest(root)
    val next = snap match {
      case Some(s) if s.startsWith("snap-") =>
        s"snap-${s.stripPrefix("snap-").toInt + 1}"
      case _ => "snap-1"
    }
    GraphPersistence.save(store, s"$root/$next")
    Files.createDirectories(walDir(root))
    writeManifest(root, Some(next), Nil)
    applied.foreach(n => Files.deleteIfExists(walDir(root).resolve(n)))
  }
}
