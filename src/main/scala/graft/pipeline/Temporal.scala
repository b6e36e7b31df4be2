package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal alignment operators for training pipelines: joining each
  * example to the LATEST feature/label state known at its timestamp
  * (point-in-time-correct feature backfill — the join that prevents
  * label leakage in time-split training data).
  */
object Temporal {

  /** As-of join: for each left row, the latest `rightValCol` whose
    * `tsCol` is <= the left row's (per `keyCol`); null when no right
    * row precedes. Equal timestamps count as "known" (inclusive,
    * `a.ts >= b.ts`); right-side timestamp collisions resolve to the
    * MAX value so the result is deterministic at any parallelism.
    * Output: `(leftIdCol, keyCol, tsCol, out)`.
    *
    * Shape — the scalable as-of formulation: tag both sides, union,
    * and take a running `last(value, ignoreNulls)` over a per-key
    * time-ordered window (right rows sort before left rows at equal
    * timestamps). ONE shuffle by key and a per-key sort; no range
    * self-join, no per-row right-side scan, so a 100 TB event stream
    * pays exactly what a groupBy over it would. A pathologically hot
    * key serializes into one task (the inherent window caveat); salt
    * by coarse time-bucket with boundary carry-forward if one key owns
    * a material share of the stream.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, leftIdCol: String, rightValCol: String,
      out: String = "asof_value"): DataFrame = {
    // The matched value rides inside a struct so that a right row whose
    // value is genuinely NULL is still a non-null window entry: the
    // running last() tracks row PRESENCE, and the NULL value propagates
    // to the output instead of falling back to an older right row.
    val r = right.groupBy(col(keyCol), col(tsCol))
      .agg(max(col(rightValCol)).as("_rv"))
      .select(col(keyCol), col(tsCol), lit(0).as("_side"),
        struct(col("_rv").as("v")).as("_rrow"),
        lit(null).cast(left.schema(leftIdCol).dataType).as("_lid"))
    val l = left.select(col(keyCol), col(tsCol), lit(1).as("_side"),
      lit(null).cast(r.schema("_rrow").dataType).as("_rrow"),
      col(leftIdCol).as("_lid"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_m", last(col("_rrow"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_lid").as(leftIdCol), col(keyCol), col(tsCol),
        col("_m")("v").as(out))
  }

  /** Trailing-window activity count: for each row, how many OTHER rows
    * of the same key fall within `windowSec` seconds at or before its
    * timestamp — the standard point-in-time rate/velocity feature
    * ("events by this user in the last hour"). A value-RANGE window
    * frame, so equal-timestamp peers are counted identically at any
    * parallelism (both engines define RANGE frames by value, peers
    * included); the row itself is excluded. One shuffle by key, one
    * per-key sort — same cost envelope as [[asofJoin]].
    */
  def rollingCount(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, windowSec: Long, out: String = "n_prior"): DataFrame = {
    // Frame evaluated over epoch MICROS, not whole seconds: a long cast
    // of the timestamp truncates to seconds and shifts the boundary by
    // up to ±1 s vs the µs-precision `ts >= t - windowSec` semantics.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, 0)
    df.select(col(idCol), col(keyCol), col(tsCol),
      (count(lit(1)).over(w) - 1).as(out))
  }
}
