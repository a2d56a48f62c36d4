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
