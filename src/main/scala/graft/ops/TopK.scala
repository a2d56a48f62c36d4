package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group (reference: BlockAnalysis `most_transacted` /
  * `top_searcher_by_profit`, /root/reference/crates/brontes-types/src/db/
  * block_analysis.rs:1903-2110).
  *
  * `row_number` over a partitioned window: one shuffle on the group keys;
  * AQE handles skewed groups. The ordering must be total (include a unique
  * tiebreaker) or the selection is nondeterministic.
  */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column], k: Int,
      rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
