package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based session assignment (reference: `partition_into_gaps`, which
  * splits sandwich/JIT candidates at empty victim sets —
  * /root/reference/crates/brontes-inspect/src/mev_inspectors/sandwich/
  * mod.rs:902).
  *
  * Classic pattern: is_new = (t - lag(t) > gap); session_id = running sum of
  * is_new. One shuffle on the key, one sort; fully parallel across keys.
  */
object Sessionize {
  /** Adds `sessionCol`: 0-based session index per key, split on gaps >
    * `gapMicros` in `tsMicrosCol` (a BIGINT epoch-micros column).
    * `tieBreak` must make the ordering total.
    */
  def byGap(df: DataFrame, keyCols: Seq[String], tsMicrosCol: String,
      tieBreak: String, gapMicros: Long, sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsMicrosCol).asc, col(tieBreak).asc)
    val isNew = when(
      col(tsMicrosCol) - lag(col(tsMicrosCol), 1).over(w) > gapMicros, 1
    ).otherwise(lit(0))
    df.withColumn(sessionCol,
      sum(when(lag(col(tsMicrosCol), 1).over(w).isNull, 0).otherwise(isNew))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
