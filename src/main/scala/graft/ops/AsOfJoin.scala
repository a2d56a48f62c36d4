package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key group.
  *
  * Reference semantics: brontes' `price_at_or_before`
  * (/root/reference/crates/brontes-types/src/db/dex.rs:183) and the CEX
  * quote nearest-before lookup (db/cex/quotes/cex_quotes.rs:103-199).
  *
  * Implementation is the union-tag-window formulation, the shuffle-minimal
  * way to express as-of in Spark without a custom physical operator:
  *   1. union left and right with a side tag,
  *   2. one shuffle on `keys`, sort by (time, side) — right sorts before
  *      left at equal timestamps so `<=` (not `<`) semantics hold,
  *   3. `last(value, ignoreNulls)` over rows unbounded-preceding forwards
  *      the latest right value onto each left row.
  * One shuffle + one sort total, versus a range join's O(n·m) comparisons.
  * Scales: partitioned by key, no broadcast, no skew beyond the key's own
  * cardinality (salt upstream if one key dominates).
  *
  * The right side must be pre-deduplicated per (keys, time) if multiple
  * rows can share a timestamp, or the forwarded value is nondeterministic.
  */
object AsOfJoin {
  /** @param left       rows to enrich; all its columns are preserved
    * @param right      lookup side: columns `keys :+ timeCol :+ valueCol`
    * @param keys       equi-join key column names (present in both)
    * @param timeCol    ordering column name (present in both, same type)
    * @param valueCol   right-side column to forward
    * @param outCol     name of the forwarded column on the result
    */
  /** [[backward]] with TIME-BUCKET SALTING for low-cardinality keys.
    *
    * A bare-key window sorts each key's ENTIRE history in one task — fine
    * for thousands of keys, a scale-killer when the key space is small
    * (j2's 42 tokens, q4's ~60 pairs at 100 TB). Salting partitions by
    * (key, ⌊time/bucketSpan⌋) so each task sorts one bounded bucket, with
    * the cross-bucket dependency restored by a CARRY table: the last right
    * value per (key, bucket), cascaded over the tiny key×bucket spine (one
    * row per bucket, not per event), then coalesced under the in-bucket
    * result. Three bounded shuffles, no task ever sees a full key history.
    *
    * Exactly equivalent to [[backward]] (same `<=` tie semantics; the
    * carry only applies when the bucket has no earlier in-bucket right
    * row, and carried values come from strictly earlier buckets). */
  def backwardSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      valueCol: String,
      outCol: String,
      bucketSpan: Long): DataFrame = {
    require(bucketSpan > 0, "bucketSpan must be positive")
    val leftCols = left.columns
    // exact floor division (times may be negative): (t - pmod(t, span)) / span
    def bucket = expr(
      s"CAST((CAST($timeCol AS BIGINT) - pmod(CAST($timeCol AS BIGINT), ${bucketSpan}L)) " +
        s"DIV ${bucketSpan}L AS BIGINT)")
    val l2 = left.withColumn("__b", bucket)
    val r2 = right.withColumn("__b", bucket)
    // last right value of each (key, bucket) — a per-bucket aggregate
    val perBucket = r2.groupBy(keys.map(col) :+ col("__b"): _*)
      .agg(max_by(col(valueCol), col(timeCol)).as("__bv"))
    // spine: every (key, bucket) either side touches; carry-in = latest
    // per-bucket value from STRICTLY EARLIER buckets. The window here runs
    // over one row per bucket — bounded regardless of event volume.
    val spine = l2.select(keys.map(col) :+ col("__b"): _*)
      .unionByName(r2.select(keys.map(col) :+ col("__b"): _*)).distinct()
    val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine.join(perBucket, keys :+ "__b", "left")
      .withColumn("__carry", last(col("__bv"), ignoreNulls = true).over(wCarry))
      .select(keys.map(col) ++ Seq(col("__b"), col("__carry")): _*)
    // in-bucket as-of: the union-tag-window of [[backward]], partitioned by
    // (keys, bucket) so every sort is bucket-local
    val saltedKeys = keys :+ "__b"
    val l = l2.withColumn("__side", lit(1))
      .withColumn("__val", lit(null).cast(right.schema(valueCol).dataType))
    val r = r2.select((saltedKeys :+ timeCol).map(col) :+ col(valueCol).as("__val"): _*)
      .withColumn("__side", lit(0))
    val unioned = l.select(
      (saltedKeys :+ timeCol).map(col) ++ Seq(col("__side"), col("__val")) ++
        leftCols.filterNot(c => saltedKeys.contains(c) || c == timeCol).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(saltedKeys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__inb", last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .join(carry, keys :+ "__b", "left")
      .withColumn(outCol, coalesce(col("__inb"), col("__carry")))
      .select(leftCols.toIndexedSeq.map(col) :+ col(outCol): _*)
  }

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      valueCol: String,
      outCol: String): DataFrame = {
    val leftCols = left.columns
    // Tag: right=0 sorts before left=1 at equal time → inclusive (<=) as-of.
    val l = left.withColumn("__side", lit(1)).withColumn("__val", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select((keys :+ timeCol).map(col) :+ col(valueCol).as("__val"): _*)
      .withColumn("__side", lit(0))
    val unioned = l.select(
      (keys :+ timeCol).map(col) ++ Seq(col("__side"), col("__val")) ++
        leftCols.filterNot(c => keys.contains(c) || c == timeCol).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(outCol, last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(col) :+ col(outCol): _*)
  }
}
