package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming / incremental mode (SURVEY §2.9 R2/R3/R5/S5): the reference's
  * tip-following executor (bin/src/executors/tip.rs) re-expressed as
  * Structured Streaming.
  *
  *  - R2 tip pipeline: `readStream` → the same per-block transforms the
  *    batch path uses → `foreachBatch` sink (S5 write-behind: ordered,
  *    exactly-once per micro-batch).
  *  - R5 incremental pool state: `flatMapGroupsWithState` keyed by pool,
  *    carrying (last price, cumulative volume, n updates) across batches —
  *    the stateful analog of the per-block pool-state fold
  *    (brontes-pricing/src/graphs/state_tracker.rs).
  *
  * The transform core is shared with batch (same DataFrame function), so
  * tip mode IS the batch pipeline on a different source — the design SURVEY
  * §7.1 step 8 calls for.
  */
object TipStream {

  /** One pool-state update event (what the classifier emits per swap). */
  case class PoolUpdate(pool: String, block: Long, txIdx: Long, px: Double, vol: Double)

  /** Running per-pool state carried across micro-batches. */
  case class PoolState(pool: String, lastPx: Double, cumVol: Double, nUpdates: Long)

  /** Emitted quote row: state AFTER applying a batch's updates. */
  case class PoolQuote(pool: String, block: Long, prePx: Option[Double],
      postPx: Double, cumVol: Double, nUpdates: Long)

  /** Batch/stream-shared transform: action-shaped rows → pool updates. */
  def toPoolUpdates(swaps: DataFrame): Dataset[PoolUpdate] = {
    val s = swaps.sparkSession
    import s.implicits._
    swaps
      .filter(col("pool").isNotNull && col("amount_in").isNotNull &&
        col("amount_out").isNotNull)
      .select(col("pool"), col("block_number").as("block"), col("tx_idx").as("txIdx"),
        (col("amount_out") / col("amount_in")).as("px"), col("amount_in").as("vol"))
      .as[PoolUpdate]
  }

  /** R5: the stateful fold — deterministic within a key because updates are
    * sorted by (block, txIdx) before folding. */
  def updatePoolState(
      pool: String,
      updates: Iterator[PoolUpdate],
      state: GroupState[PoolState]): Iterator[PoolQuote] = {
    val sorted = updates.toSeq.sortBy(u => (u.block, u.txIdx))
    if (sorted.isEmpty) Iterator.empty
    else {
      val prev = state.getOption
      var st = prev.getOrElse(PoolState(pool, Double.NaN, 0.0, 0L))
      val out = sorted.map { u =>
        val pre = if (st.nUpdates == 0) None else Some(st.lastPx)
        st = PoolState(pool, u.px, st.cumVol + u.vol, st.nUpdates + 1)
        PoolQuote(pool, u.block, pre, u.px, st.cumVol, st.nUpdates)
      }
      state.update(st)
      out.iterator
    }
  }

  /** R5 wiring: pool updates (batch or stream) → stateful quote emission. */
  def poolQuotes(updates: Dataset[PoolUpdate]): Dataset[PoolQuote] = {
    val s = updates.sparkSession
    import s.implicits._
    updates.groupByKey(_.pool)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        updatePoolState)
  }

  /** One block's pre-aggregated pool activity (R4 stream input grain). */
  case class BlockVol(pool: String, block: Long, vol: Double, n: Long)

  /** Last-block state carried by the R4 sliding window. */
  case class WndState(block: Long, vol: Double, n: Long)

  /** Emitted multi-block window row: totals over blocks [b-1, b]. */
  case class WndRow(pool: String, block: Long, wndVol: Double, wndN: Long,
      blksInWnd: Int)

  /** R4: the multi-block sliding window as a stateful stream — the
    * reference buffers the last `max(block_window)` blocks and emits
    * `MultiBlockData` per block (bin/src/executors/shared/
    * multi_block_window.rs); here each pool's fold carries the previous
    * block's aggregate and emits the 2-block window on every new block.
    * Input is PRE-AGGREGATED to (pool, block) grain so the window total is
    * one IEEE addition — deterministic and oracle-matchable — rather than
    * an order-dependent refold of raw events. */
  def slideWindow(
      pool: String,
      rows: Iterator[BlockVol],
      state: GroupState[WndState]): Iterator[WndRow] = {
    val sorted = rows.toSeq.sortBy(_.block)
    var prev = state.getOption
    val out = sorted.map { b =>
      val w = prev.filter(_.block == b.block - 1) match {
        case Some(p) => WndRow(pool, b.block, p.vol + b.vol, p.n + b.n, 2)
        case None => WndRow(pool, b.block, b.vol, b.n, 1)
      }
      prev = Some(WndState(b.block, b.vol, b.n))
      w
    }
    prev.foreach(state.update)
    out.iterator
  }

  /** R4 wiring: per-block pool volumes → sliding-window emission. */
  def blockWindows(blocks: Dataset[BlockVol]): Dataset[WndRow] = {
    val s = blocks.sparkSession
    import s.implicits._
    blocks.groupByKey(_.pool)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        slideWindow)
  }

  /** Linearized tick of a price — the coordinate f10_tick_cross's planted
    * curve uses (√P(t) = 1 + t/10⁴, so t = ⌊(px−1)·10⁴⌋). The real
    * tick_math.rs log-base-1.0001 form needs libm pow/log; the linear form
    * keeps the streaming fold engine-portable. */
  def tickOf(px: Double): Long = math.floor((px - 1.0) * 10000.0).toLong

  /** True when a quote's pre→post move crossed an initialized tick
    * boundary — the streaming analog of the tick_bitmap walk: the V3 fold
    * must re-read range liquidity whenever this fires (uniswap_v3_math/
    * tick_bitmap.rs next_initialized_tick_within_one_word). */
  def crossedBoundary(q: PoolQuote): Boolean =
    q.prePx.exists(p => tickOf(p) != tickOf(q.postPx))

  /** R2+S5: follow a parquet directory as the chain tip, maintain pool
    * state, and write each micro-batch through foreachBatch (the ordered
    * write-behind sink). Returns the running query. */
  def runTip(spark: SparkSession, srcDir: String, outDir: String,
      checkpoint: String): StreamingQuery = {
    import spark.implicits._
    val schema = "pool STRING, block_number BIGINT, tx_idx BIGINT, " +
      "amount_in DOUBLE, amount_out DOUBLE"
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    poolQuotes(toPoolUpdates(stream)).toDF()
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("append").parquet(s"$outDir/batch=$batchId")
      }
      .start()
  }
}
