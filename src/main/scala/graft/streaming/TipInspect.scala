package graft.streaming

import graft.{QueryDef, QueryModule}
import graft.domain.{Accounting, ChainFixture, InspectorOps}
import graft.domain.Accounting.{sqlGateFlag, sqlGateProfit}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** R2 tip-mode END-TO-END equivalence (SURVEY §3 second entry point): the
  * reference's `TipInspector` runs the WHOLE classify → price → inspect
  * lifecycle per new block as the chain tip advances
  * (bin/src/executors/tip.rs:23-155, feeding `shared/state_collector.rs:118`
  * and the same inspector set the batch `RangeExecutor` runs). The other
  * streaming entries verify each STAGE's state carry in isolation; this one
  * verifies the COMPOSED pipeline: a genuine Structured Streaming query
  * (parquet-drop file source, checkpointed foreachBatch sink, three
  * block-range micro-batches) whose per-batch body is the SAME batch
  * dataflow — [[ChainFixture.actionsOf]] classify, [[Accounting.headersOf]]
  * pricing/PnL, and the Q1 sandwich / Q2 atomic-arb / Q7 liquidation
  * inspector cores — and whose unioned bundle emission hash-matches the
  * batch composer formulation in DuckDB.
  *
  * Cross-block windows at the tip: Q1's bracket and Q2's trigger search
  * read a 2-block window, so a micro-batch alone cannot verify candidates
  * whose window crosses its leading edge. The reference buffers the last
  * `max(block_window)` blocks between blocks (bin/src/executors/shared/
  * multi_block_window.rs); here each foreachBatch invocation persists its
  * LAST block's traces as a tail table keyed by batch id and the next
  * invocation unions its predecessor's tail before inspecting — then emits
  * only bundles anchored in its OWN blocks (back_block / arb block ≥ the
  * batch's min block), so every bundle is emitted exactly once and with its
  * full window visible. Both the tail and the bundle output are batch-id
  * OVERWRITES, keeping the at-least-once foreachBatch contract effectively
  * exactly-once (the [[TipStream]] write-behind discipline).
  *
  * Scale shape: per micro-batch work is one block's traces at a real tip
  * (a tercile here only because the fixture replays the corpus in three
  * drops); every stage inside the batch is the batch path's own equi-keyed
  * dataflow, and the tail carry is one block of traces per batch — O(block),
  * not O(history).
  */
object TipInspect extends QueryModule {

  import ChainFixture.{tokenPrice, tokenPriceSql}

  def defs: Seq[QueryDef] = Seq(r2TipInspect)

  private def withCtes(sql: String) =
    Some(s"WITH ${Accounting.sqlDomainCtes}, $sql")

  /** Per-batch micro-batch shuffle width (the stream-local analog of the
    * other fold entries' stream partitions — per-block work at a real tip). */
  private val ShufflePartitions = "8"

  /** The composed per-slice inspection: classify the trace slice, build
    * headers, run Q1+Q2+Q7, and emit one normalized bundle row per
    * detection anchored at block ≥ `minOwnBlock` (rows below the bar belong
    * to the PREVIOUS batch, which already emitted them with its own full
    * window). Shared verbatim by the streamed foreachBatch body and the
    * batch-parity check in StreamingSpec — tip mode IS the batch pipeline
    * on a different source. */
  private[graft] def inspectBundles(s: SparkSession, tracesDf: DataFrame,
      minOwnBlock: Long): DataFrame = {
    val nullStr = lit(null).cast("string")
    val acts = ChainFixture.actionsOf(s, tracesDf)
    val hdr = Accounting.headersOf(s, tracesDf, acts)
      .select("tx_hash", "block_number", "eoa", "revenue_usd", "gas_usd",
        "profit_usd")
    val sw = InspectorOps.swapsOf(acts)

    // Q1: verified sandwiches (victim ratio + price sanity + shrink), PnL
    // from the front AND back txs' headers, attributed to the back block
    val sand = InspectorOps.sandwichesOf(InspectorOps.swTxFromSwaps(sw))
      .filter(col("back_block") >= minOwnBlock)
      .join(hdr.select(col("tx_hash").as("front_tx"),
        col("profit_usd").as("front_profit")), "front_tx")
      .join(hdr.select(col("tx_hash").as("back_tx"),
        col("profit_usd").as("back_profit")), "back_tx")
      .select(lit("sandwich").as("btype"),
        col("back_block").as("block_number"),
        col("front_tx").as("tx1"), col("back_tx").as("tx2"),
        col("pool"), col("eoa"), nullStr.as("tag"),
        (col("front_profit") + col("back_profit")).as("profit_usd"),
        ((col("back_out") - col("sum_in")) * tokenPrice(col("tok_in")))
          .as("aux_usd"),
        col("n_victims").cast("long").as("n1"),
        col("found_at_iter").cast("long").as("n2"),
        lit(1).as("flag"))

    // Q2: atomic arbs with the validity heuristic and the 2-block trigger
    // search (n2: 0 = no trigger, 1 = same block, 2 = previous block)
    val a = InspectorOps.arbsOf(sw)
    val arb = a.join(hdr, "tx_hash")
      .join(broadcast(ChainFixture.searchers(s)),
        col("eoa") === col("s_eoa"), "left")
      .join(InspectorOps.triggerPicks(a, sw), Seq("tx_hash"), "left")
      .filter(col("block_number") >= minOwnBlock)
      .select(lit("atomic_arb").as("btype"), col("block_number"),
        col("tx_hash").as("tx1"), nullStr.as("tx2"), nullStr.as("pool"),
        col("eoa"), col("arb_type").as("tag"),
        col("profit_usd"), col("gas_usd").as("aux_usd"),
        col("n_swaps").cast("long").as("n1"),
        when(col("trigger_tx").isNull, 0L)
          .when(col("trig_same_block"), 1L).otherwise(2L).as("n2"),
        when(col("profit_usd") > 0 || col("s_eoa").isNotNull ||
          col("gas_usd") > 50.0, 1).otherwise(0).as("flag"))

    // Q7: per-tx liquidation bundles through the priced-profit gate
    val liq = InspectorOps.liquidationBundlesOf(acts, hdr)
      .filter(col("block_number") >= minOwnBlock)
      .select(lit("liquidation").as("btype"), col("block_number"),
        col("tx_hash").as("tx1"), nullStr.as("tx2"), nullStr.as("pool"),
        col("eoa"), nullStr.as("tag"),
        col("profit_usd"), col("revenue_usd").as("aux_usd"),
        col("n_liq").as("n1"), col("n_liq_swaps").as("n2"),
        col("has_dex_price").as("flag"))

    sand.unionByName(arb).unionByName(liq)
  }

  /** Tercile batch tag by block_number — the three-drop composition the
    * other streamed entries share, computed from a one-row agg. */
  private def withTerciles(in: DataFrame): DataFrame = {
    val mbRow = in.agg(max(col("block_number"))).head()
    val mb = if (mbRow.isNullAt(0)) 0L else mbRow.getLong(0)
    val (cut1, cut2) = (mb / 3, 2 * mb / 3)
    in.withColumn("batch",
      when(col("block_number") <= cut1, 0L)
        .when(col("block_number") <= cut2, 1L).otherwise(2L))
  }

  private val r2TipInspect = QueryDef(
    "r2_tip_inspect",
    (s, dir) => {
      val batched = withTerciles(ChainFixture.tracesTable(s, dir))
      val tmp = java.nio.file.Files.createTempDirectory("graft_r2tip").toString
      StreamOracle.deleteOnExit(tmp)
      val (src, out, tail, ckpt) =
        (s"$tmp/src", s"$tmp/out", s"$tmp/tail", s"$tmp/ckpt")
      val data = batched.persist()
      try {
        data.filter(col("batch") === 0L).drop("batch")
          .coalesce(1).write.parquet(src)
        val s2 = s.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", ShufflePartitions)
        val stream = s2.readStream
          .schema(data.drop("batch").schema).parquet(src)
        val q = stream.writeStream
          .outputMode(OutputMode.Append())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: DataFrame, batchId: Long) =>
            val ss = b.sparkSession
            val bp = b.persist()
            try {
              val mm = bp.agg(min(col("block_number")),
                max(col("block_number"))).head()
              if (!mm.isNullAt(0)) {
                val (mn, mx) = (mm.getLong(0), mm.getLong(1))
                // union the predecessor's tail so this batch's leading-edge
                // 2-block windows are complete (multi_block_window buffer)
                val prev = new java.io.File(s"$tail/batch=${batchId - 1}")
                val full =
                  if (batchId > 0 && prev.exists())
                    ss.read.parquet(prev.toString).unionByName(bp)
                  else bp
                inspectBundles(ss, full, mn)
                  .write.mode("overwrite").parquet(s"$out/batch=$batchId")
                // the tail for the NEXT batch: this batch's last block
                full.filter(col("block_number") === mx)
                  .write.mode("overwrite").parquet(s"$tail/batch=$batchId")
              }
            } finally { bp.unpersist(false); () }
          }
          .start()
        try {
          q.processAllAvailable()
          (1L to 2L).foreach { i =>
            data.filter(col("batch") === i).drop("batch")
              .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
          }
        } finally q.stop()
      } finally { data.unpersist(false); () }
      s.read.parquet(out).drop("batch")
        .orderBy("btype", "block_number", "tx1", "tx2", "pool")
    },
    withCtes(s"""${InspectorOps.sandwichOracleCtes},
      ${InspectorOps.arbOracleCtes},
      tipsearchers AS ${ChainFixture.searchersCteBody},
      tipliqb AS (
        SELECT tx_hash, COUNT(*) AS n_liq FROM actions
        WHERE action_type = 'liquidation' GROUP BY 1),
      tipswb AS (SELECT tx_hash, COUNT(*) AS n_liq_swaps FROM swaps GROUP BY 1),
      tipunp AS (
        SELECT DISTINCT tx_hash FROM actions
        WHERE (token_in_id IS NOT NULL AND dec_in IS NULL)
           OR (token_out_id IS NOT NULL AND dec_out IS NULL)),
      tipliq AS (
        SELECT l.tx_hash, h.block_number, h.eoa, l.n_liq,
          CAST(COALESCE(s.n_liq_swaps, 0) AS BIGINT) AS n_liq_swaps,
          h.revenue_usd, h.gas_usd,
          CASE WHEN u.tx_hash IS NULL THEN 1 ELSE 0 END AS priced
        FROM tipliqb l JOIN header h ON l.tx_hash = h.tx_hash
        LEFT JOIN tipswb s ON l.tx_hash = s.tx_hash
        LEFT JOIN tipunp u ON l.tx_hash = u.tx_hash)
      SELECT 'sandwich' AS btype, s.back_block AS block_number,
        s.front_tx AS tx1, s.back_tx AS tx2, s.pool, s.eoa,
        CAST(NULL AS VARCHAR) AS tag,
        hf.profit_usd + hb.profit_usd AS profit_usd,
        (s.back_out - s.sum_in) * ${tokenPriceSql("s.tok_in")} AS aux_usd,
        CAST(s.n_victims AS BIGINT) AS n1,
        CAST(s.found_at_iter AS BIGINT) AS n2,
        CAST(1 AS INTEGER) AS flag
      FROM sand s
      JOIN header hf ON s.front_tx = hf.tx_hash
      JOIN header hb ON s.back_tx = hb.tx_hash
      UNION ALL
      SELECT 'atomic_arb', h.block_number, a.tx_hash,
        CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), h.eoa, a.arb_type,
        h.profit_usd, h.gas_usd, CAST(a.n_swaps AS BIGINT),
        CAST(CASE WHEN t.trigger_tx IS NULL THEN 0
                  WHEN t.trig_same_block THEN 1 ELSE 2 END AS BIGINT),
        CAST(CASE WHEN h.profit_usd > 0 OR se.s_eoa IS NOT NULL
                    OR h.gas_usd > 50.0e0 THEN 1 ELSE 0 END AS INTEGER)
      FROM arb a JOIN header h ON a.tx_hash = h.tx_hash
      LEFT JOIN tipsearchers se ON h.eoa = se.s_eoa
      LEFT JOIN tpick t ON a.tx_hash = t.tx_hash
      UNION ALL
      SELECT 'liquidation', block_number, tx_hash,
        CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), eoa,
        CAST(NULL AS VARCHAR),
        ${sqlGateProfit("revenue_usd - gas_usd", "priced")},
        revenue_usd, n_liq, n_liq_swaps,
        ${sqlGateFlag("revenue_usd - gas_usd", "priced")}
      FROM tipliq
      ORDER BY 1, 2, 3, 4, 5"""))
}
