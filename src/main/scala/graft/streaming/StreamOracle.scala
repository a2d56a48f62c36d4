package graft.streaming

import graft.{QueryDef, QueryModule}
import graft.domain.ChainFixture
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch-equivalence oracle for the streaming trio (SURVEY §2.9 R2/R5 +
  * §2.1 S5): the tip pipeline's stateful per-pool fold is deterministic and
  * SQL-expressible, so the REAL Structured Streaming query (MemoryStream →
  * flatMapGroupsWithState → memory sink, multiple micro-batches) can be
  * hash-checked against a relational DuckDB formulation of the same fold —
  * closing the "streaming path untested vs oracle" gap with a genuine
  * streamed execution, not a batch stand-in.
  *
  * Input updates are pre-rolled to one row per (pool, block, tx) so the
  * fold's (block, txIdx) sort is a TOTAL order and the emission sequence is
  * engine-independent. The stream is driven in three block-range
  * micro-batches, so state (prePx, nUpdates) must carry across batch
  * boundaries to match the oracle's windows — that carry IS what this
  * entry verifies.
  */
object StreamOracle extends QueryModule {

  def defs: Seq[QueryDef] = Seq(r5StreamFold, r4StreamWindow)

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def withCtes(sql: String) = Some(s"WITH ${ChainFixture.sqlCtes} $sql")

  /** Deduplicated pool updates: one per (pool, block, tx), px = first
    * leg's rate, vol = exact decimal sum of inputs. */
  private def updates(s: SparkSession, dir: String): DataFrame =
    ChainFixture.actionsTable(s, dir)
      .filter(col("action_type") === "swap" && col("pool").isNotNull &&
        col("amount_in").isNotNull && col("amount_out").isNotNull)
      .groupBy(col("pool"), col("block_number").as("block"),
        col("tx_idx").as("txIdx"))
      .agg(min_by(col("amount_out") / col("amount_in"), col("trace_idx")).as("px"),
        graft.ops.ExactAgg.dsum(col("amount_in")).as("vol"))

  private val r5StreamFold = QueryDef(
    "r5_stream_fold",
    (s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val upd = updates(s, dir).as[TipStream.PoolUpdate]
        .collect().sortBy(u => (u.block, u.txIdx, u.pool))
      val maxBlock = upd.iterator.map(_.block).foldLeft(0L)(math.max)
      val cut1 = maxBlock / 3
      val cut2 = 2 * maxBlock / 3
      val input = MemoryStream[TipStream.PoolUpdate]
      // unique sink name per invocation (Bench runs every query twice)
      val name = s"r5_fold_${runSeq.incrementAndGet()}"
      val q = TipStream.poolQuotes(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        // three micro-batches in block order — the fold's state must carry
        input.addData(upd.filter(_.block <= cut1).toSeq)
        q.processAllAvailable()
        input.addData(upd.filter(u => u.block > cut1 && u.block <= cut2).toSeq)
        q.processAllAvailable()
        input.addData(upd.filter(_.block > cut2).toSeq)
        q.processAllAvailable()
        def tick(c: org.apache.spark.sql.Column) =
          floor((c - 1.0) * 10000.0)
        s.table(name)
          .select(col("pool"), col("block"), col("prePx"), col("postPx"),
            col("nUpdates").as("n_updates"),
            (col("prePx").isNotNull &&
              tick(col("prePx")) =!= tick(col("postPx"))).as("crossed"))
          .withColumnRenamed("prePx", "pre_px")
          .withColumnRenamed("postPx", "post_px")
          .orderBy("pool", "n_updates")
      } finally q.stop()
    },
    withCtes(""", upd AS (
        SELECT pool, block_number AS block, tx_idx,
          ARG_MIN(amount_out / amount_in, trace_idx) AS px
        FROM actions
        WHERE action_type = 'swap' AND pool IS NOT NULL
          AND amount_in IS NOT NULL AND amount_out IS NOT NULL
        GROUP BY 1, 2, 3),
      fold AS (
        SELECT pool, block, LAG(px) OVER w AS pre_px, px AS post_px,
          ROW_NUMBER() OVER w AS n_updates
        FROM upd
        WINDOW w AS (PARTITION BY pool ORDER BY block, tx_idx))
      SELECT pool, block, pre_px, post_px, n_updates,
        (pre_px IS NOT NULL AND
         FLOOR((pre_px - 1.0e0) * 10000.0e0) <> FLOOR((post_px - 1.0e0) * 10000.0e0))
          AS crossed
      FROM fold ORDER BY pool, n_updates"""))

  /** R4 batch-equivalence: the REAL streamed 2-block sliding window
    * (MemoryStream → flatMapGroupsWithState → memory sink, three
    * micro-batches cut mid-stream so the previous-block state must carry
    * across batch boundaries) against a LAG-window DuckDB formulation.
    * Input is (pool, block)-grain decimal-exact volumes, so the window
    * total is a single deterministic IEEE addition on both engines. */
  private val r4StreamWindow = QueryDef(
    "r4_stream_window",
    (s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val blocks = updates(s, dir)
        .groupBy(col("pool"), col("block"))
        .agg(graft.ops.ExactAgg.dsum(col("vol")).as("vol"),
          count(lit(1)).as("n"))
        .as[TipStream.BlockVol]
        .collect().sortBy(b => (b.block, b.pool))
      val maxBlock = blocks.iterator.map(_.block).foldLeft(0L)(math.max)
      val cut1 = maxBlock / 3
      val cut2 = 2 * maxBlock / 3
      val input = MemoryStream[TipStream.BlockVol]
      val name = s"r4_wnd_${runSeq.incrementAndGet()}"
      val q = TipStream.blockWindows(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(blocks.filter(_.block <= cut1).toSeq)
        q.processAllAvailable()
        input.addData(blocks.filter(b => b.block > cut1 && b.block <= cut2).toSeq)
        q.processAllAvailable()
        input.addData(blocks.filter(_.block > cut2).toSeq)
        q.processAllAvailable()
        s.table(name)
          .select(col("pool"), col("block"), col("wndVol").as("wnd_vol"),
            col("wndN").as("wnd_n"), col("blksInWnd").as("blks_in_wnd"))
          .orderBy("pool", "block")
      } finally q.stop()
    },
    withCtes(""", upd AS (
        SELECT pool, block_number AS block, tx_idx,
          CAST(CAST(SUM(CAST(amount_in AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS vol
        FROM actions
        WHERE action_type = 'swap' AND pool IS NOT NULL
          AND amount_in IS NOT NULL AND amount_out IS NOT NULL
        GROUP BY 1, 2, 3),
      blk AS (
        SELECT pool, block,
          CAST(CAST(SUM(CAST(vol AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS vol,
          COUNT(*) AS n
        FROM upd GROUP BY 1, 2),
      wnd AS (
        SELECT pool, block,
          CASE WHEN LAG(block) OVER w = block - 1
               THEN LAG(vol) OVER w + vol ELSE vol END AS wnd_vol,
          CAST(CASE WHEN LAG(block) OVER w = block - 1
               THEN LAG(n) OVER w + n ELSE n END AS BIGINT) AS wnd_n,
          CASE WHEN LAG(block) OVER w = block - 1 THEN 2 ELSE 1 END AS blks_in_wnd
        FROM blk WINDOW w AS (PARTITION BY pool ORDER BY block))
      SELECT * FROM wnd ORDER BY pool, block"""))
}
