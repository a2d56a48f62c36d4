package graft.streaming

import graft.{QueryDef, QueryModule}
import graft.domain.{Accounting, ChainFixture, InspectorOps}
import graft.domain.Accounting.{sqlGateFlag, sqlGateProfit}
import graft.ops.ExactAgg.{dsum, sqlSum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** R2 tip-mode END-TO-END equivalence (SURVEY §3 second entry point): the
  * reference's `TipInspector` runs the WHOLE classify → price → inspect
  * lifecycle per new block as the chain tip advances
  * (bin/src/executors/tip.rs:23-155, feeding `shared/state_collector.rs:118`
  * and the same inspector set the batch `RangeExecutor` runs). The other
  * streaming entries verify each STAGE's state carry in isolation; the two
  * entries here verify the COMPOSED pipeline: a genuine Structured Streaming
  * query (parquet-drop file source, checkpointed foreachBatch sink, three
  * block-range micro-batches) whose per-batch body is the SAME batch
  * dataflow — [[ChainFixture.actionsOf]] classify, [[Accounting.headersOf]]
  * pricing/PnL, then
  *   - `r2_tip_inspect`: the Q1 sandwich / Q2 atomic-arb / Q7 liquidation
  *     inspector cores, unioned bundle emission;
  *   - `r2_tip_composer`: the FULL composer path the reference's tip
  *     executor runs per block (`processors/mev.rs:34-58`) — all seven
  *     candidate surfaces (sandwich, JIT, liquidation, arb, CEX-DEX,
  *     JitSandwich, JIT-CEX-DEX), the J12 metadata join (per-batch
  *     broadcast of the searcher-label and price dimensions), the J10
  *     two-layer composer dedup, and the A4 MevBlock rollup —
  * each hash-matching its batch formulation in DuckDB.
  *
  * Cross-block windows at the tip: Q1's bracket and Q2's trigger search
  * read a 2-block window, so a micro-batch alone cannot verify candidates
  * whose window crosses its leading edge. The reference buffers the last
  * `max(block_window)` blocks between blocks (bin/src/executors/shared/
  * multi_block_window.rs); here each foreachBatch invocation persists its
  * LAST block's traces as a tail table keyed by batch id and the next
  * invocation unions its predecessor's tail before inspecting — then emits
  * only rows anchored in its OWN blocks (back_block / arb block ≥ the
  * batch's min block), so every row is emitted exactly once and with its
  * full window visible. Both the tail and the output are batch-id
  * OVERWRITES, keeping the at-least-once foreachBatch contract effectively
  * exactly-once (the [[TipStream]] write-behind discipline). An EMPTY
  * micro-batch copies its predecessor's tail forward (so a batch-id gap
  * cannot silently strip the next batch's leading-edge windows), and a
  * missing predecessor tail fails loudly instead of degrading (ADVICE r14).
  *
  * Scale shape: per micro-batch work is one block's traces at a real tip
  * (a tercile here only because the fixture replays the corpus in three
  * drops); every stage inside the batch is the batch path's own equi-keyed
  * dataflow, and the tail carry is one block of traces per batch — O(block),
  * not O(history).
  */
object TipInspect extends QueryModule {

  import ChainFixture.{tokenPrice, tokenPriceSql}

  def defs: Seq[QueryDef] = Seq(r2TipInspect, r2TipComposer)

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
      minOwnBlock: Long, preActs: Option[DataFrame] = None,
      preHdr: Option[DataFrame] = None, preSand: Option[DataFrame] = None,
      preArbs: Option[DataFrame] = None): DataFrame = {
    val nullStr = lit(null).cast("string")
    val acts = preActs.getOrElse(ChainFixture.actionsOf(s, tracesDf))
    val hdr = preHdr.getOrElse(Accounting.headersOf(s, tracesDf, acts))
      .select("tx_hash", "block_number", "eoa", "revenue_usd", "gas_usd",
        "profit_usd")
    val sw = InspectorOps.swapsOf(acts)

    // Q1: verified sandwiches (victim ratio + price sanity + shrink), PnL
    // from the front AND back txs' headers, attributed to the back block
    val sand = preSand
      .getOrElse(InspectorOps.sandwichesOf(InspectorOps.swTxFromSwaps(sw)))
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
    val a = preArbs.getOrElse(InspectorOps.arbsOf(sw))
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

  /** The reference tip executor's FULL per-block composition
    * (`processors/mev.rs:34-58` runs `run_block_inspection` over the whole
    * inspector set, then the composer): all seven J10 candidate surfaces
    * built from the slice, the J12 metadata join (searcher labels +
    * per-block builder identity, broadcast per micro-batch — the
    * `shared/metadata_loader.rs:41-98` analog), the two-layer composer
    * dedup, and the A4 MevBlock rollup. The dedup scope is PER ANCHOR
    * BLOCK, exactly the reference's: the tip composer dedups the bundles
    * of the block being processed against each other (composer/mod.rs:
    * 190-232 runs inside one `run_block_inspection`), never against a
    * prior block's already-emitted bundles — which is also what makes a
    * micro-batch's composition equal the batch formulation restricted to
    * its own blocks. Spark-side the scope is carried by prefixing every
    * (bundle, tx) edge key with the bundle's anchor block, so the
    * tx-equi-keyed [[InspectorOps.matrixCrossKills]] machinery is reused
    * verbatim.
    *
    * Output rows (one frame, three kinds, all anchored at
    * block ≥ `minOwnBlock`):
    *   kind='bundle'     — each SURVIVING composed bundle
    *                       (block, mev_type, bid, profit, n_txs)
    *   kind='type_count' — per (block, mev_type) raw vs post-dedup counts
    *   kind='mev_block'  — the A4 rollup: builder, tx count, exact-decimal
    *                       gas/profit sums (q9_mev_block's header shape)
    */
  private[graft] def composedMevOf(s: SparkSession, tracesDf: DataFrame,
      minOwnBlock: Long, preActs: Option[DataFrame] = None,
      preHdr: Option[DataFrame] = None, preSwTx: Option[DataFrame] = None,
      preSand: Option[DataFrame] = None,
      preArbs: Option[DataFrame] = None): DataFrame = {
    val nullStr = lit(null).cast("string")
    val nullD = lit(null).cast("double")
    val nullL = lit(null).cast("long")
    val acts = preActs.getOrElse(ChainFixture.actionsOf(s, tracesDf))
    val hdr = preHdr.getOrElse(Accounting.headersOf(s, tracesDf, acts))
    val hdrK = hdr.select(col("tx_hash").as("h_tx"),
      col("profit_usd"), col("eoa").as("h_eoa"),
      col("block_number").as("h_block"))
    val sw = InspectorOps.swapsOf(acts)
    val swTx = preSwTx.getOrElse(InspectorOps.swTxFromSwaps(sw))

    // the seven candidate surfaces — the j10_bundle_dedup formulations,
    // each keeping its ANCHOR block (`blk`)
    val sand = preSand.getOrElse(InspectorOps.sandwichesOf(swTx)).select(
      col("back_block").as("blk"),
      concat(col("front_tx"), lit("|"), col("back_tx"), lit("|"), col("pool"))
        .as("bid"),
      lit("sandwich").as("mev_type"),
      (col("back_out") - col("sum_in")).as("profit"),
      array(col("front_tx"), col("back_tx")).as("txs"),
      nullStr.as("arb_type"), lit(false).as("labeled")).distinct()
    // three consumers (jit, jit_sandwich, jit_cexdex) — eager-cut like the
    // bundle/edge frames below so the mint↔burn pairing runs once per batch
    val jitp = InspectorOps.jitPairsOf(acts).localCheckpoint()
    val jit = jitp.select(
      col("block_number").as("blk"),
      concat(col("tx_hash"), lit("|"), col("burn_tx"), lit("|"), col("pool"))
        .as("bid"),
      lit("jit").as("mev_type"), lit(0.0).as("profit"),
      array(col("tx_hash"), col("burn_tx")).as("txs"),
      nullStr.as("arb_type"), lit(false).as("labeled")).distinct()
    val liq = acts.filter(col("action_type") === "liquidation")
      .select("tx_hash").distinct()
      .join(hdrK, col("tx_hash") === col("h_tx"))
      .select(col("h_block").as("blk"), col("tx_hash").as("bid"),
        lit("liquidation").as("mev_type"), lit(0.0).as("profit"),
        array(col("tx_hash")).as("txs"),
        nullStr.as("arb_type"), lit(false).as("labeled"))
    val arb = preArbs.getOrElse(InspectorOps.arbsOf(sw))
      .join(hdrK, col("tx_hash") === col("h_tx"))
      .select(col("h_block").as("blk"), col("tx_hash").as("bid"),
        lit("arb").as("mev_type"), col("profit_usd").as("profit"),
        array(col("tx_hash")).as("txs"), col("arb_type"),
        lit(false).as("labeled"))
    // CEX-DEX candidates through the J12 metadata join: lone-swap txs
    // priced by the header, searcher-labeled via the broadcast dimension;
    // eager-cut — two consumers (cexdex, jit_cexdex)
    val cexdexBase = sw.groupBy("tx_hash")
      .agg(count(lit(1)).as("n_sw")).filter(col("n_sw") === 1)
      .join(hdrK, col("tx_hash") === col("h_tx"))
      .join(broadcast(ChainFixture.searchers(s)),
        col("h_eoa") === col("s_eoa"), "left")
      .localCheckpoint()
    val cexdex = cexdexBase.select(col("h_block").as("blk"),
      col("tx_hash").as("bid"), lit("cexdex").as("mev_type"),
      col("profit_usd").as("profit"), array(col("tx_hash")).as("txs"),
      nullStr.as("arb_type"), col("s_eoa").isNotNull.as("labeled"))
    val jsw = InspectorOps.bracketsOf(swTx)
      .select(col("back_block"), col("eoa"), col("front_tx"), col("back_tx"),
        (col("back_out") - col("sum_in")).as("b_profit"))
      .join(jitp.select(col("block_number").as("j_block"),
        col("eoa").as("j_eoa"), col("tx_hash").as("mint_tx"), col("burn_tx")),
        col("back_block") === col("j_block") && col("eoa") === col("j_eoa"))
      .select(col("back_block").as("blk"),
        concat(col("front_tx"), lit("|"), col("back_tx"), lit("|"),
          col("mint_tx"), lit("|"), col("burn_tx")).as("bid"),
        lit("jit_sandwich").as("mev_type"), col("b_profit").as("profit"),
        array(col("front_tx"), col("back_tx"), col("mint_tx"), col("burn_tx"))
          .as("txs"),
        nullStr.as("arb_type"), lit(false).as("labeled"))
      .distinct()
    val jcx = jitp.select(col("block_number").as("x_block"),
        col("eoa").as("x_eoa"), col("tx_hash").as("mint_tx"), col("burn_tx"))
      .join(cexdexBase.select(col("tx_hash").as("cx_tx"),
        col("h_block"), col("h_eoa"), col("profit_usd")),
        col("x_block") === col("h_block") && col("x_eoa") === col("h_eoa"))
      .select(col("x_block").as("blk"),
        concat(col("mint_tx"), lit("|"), col("burn_tx"), lit("|"), col("cx_tx"))
          .as("bid"),
        lit("jit_cexdex").as("mev_type"), col("profit_usd").as("profit"),
        array(col("mint_tx"), col("burn_tx"), col("cx_tx")).as("txs"),
        nullStr.as("arb_type"), lit(false).as("labeled"))
      .distinct()

    // eager cuts: the bundle table feeds three output arms and the edge
    // frame six dedup branches — same discipline as j10's materialized
    // pipeline intermediates, micro-batch-sized here
    val bundles = sand.unionByName(jit).unionByName(liq).unionByName(arb)
      .unionByName(cexdex).unionByName(jsw).unionByName(jcx)
      .withColumn("bid", concat_ws("|", col("mev_type"), col("bid")))
      .withColumn("n_txs", size(array_distinct(col("txs"))))
      .localCheckpoint()
    // scope every (bundle, tx) edge by the bundle's anchor block — the
    // per-block composer scope — then reuse the tx-keyed kill machinery
    val edges = bundles.select(col("bid"), col("mev_type"), col("blk"),
        col("n_txs"), col("profit"), col("arb_type"), col("labeled"),
        explode(array_distinct(col("txs"))).as("tx0"))
      .withColumn("tx", concat_ws("|", col("blk"), col("tx0")))
      .localCheckpoint()
    val xrem = InspectorOps.matrixCrossKills(edges)
    val surv = edges.join(xrem, Seq("bid"), "left_anti")
    val other = surv.select(col("tx").as("o_tx"), col("mev_type").as("o_type"),
      col("bid").as("o_bid"), col("n_txs").as("o_n"),
      col("profit").as("o_profit"))
    val wrem = surv
      .join(other, col("tx") === col("o_tx") &&
        col("mev_type") === col("o_type") && col("bid") =!= col("o_bid") &&
        (col("o_n") > col("n_txs") ||
          (col("o_n") === col("n_txs") &&
            (col("o_profit") < col("profit") ||
              (col("o_profit") === col("profit") && col("o_bid") < col("bid"))))),
        "left_semi")
      .select("bid").distinct()
    val flagged = bundles
      .join(xrem.withColumn("xr", lit(1)), Seq("bid"), "left")
      .join(wrem.withColumn("wr", lit(1)), Seq("bid"), "left")
      .filter(col("blk") >= minOwnBlock)

    val bundleArm = flagged.filter(col("xr").isNull && col("wr").isNull)
      .select(lit("bundle").as("kind"), col("blk").as("block_number"),
        col("mev_type"), col("bid").as("key"),
        col("profit").cast("double").as("d1"), nullD.as("d2"),
        col("n_txs").cast("long").as("n1"), nullL.as("n2"))
    val typeArm = flagged.groupBy(col("blk"), col("mev_type"))
      .agg(sum(when(col("xr").isNull && col("wr").isNull, 1L).otherwise(0L))
        .as("n_final"), count(lit(1)).as("n_raw"))
      .select(lit("type_count").as("kind"), col("blk").as("block_number"),
        col("mev_type"), nullStr.as("key"), nullD.as("d1"), nullD.as("d2"),
        col("n_final").as("n1"), col("n_raw").as("n2"))
    // A4: the MevBlock header row — builder identity is the deterministic
    // per-block metadata dimension, computed inline like txGasOf's base fee
    val blockArm = hdr.filter(col("block_number") >= minOwnBlock)
      .groupBy("block_number")
      .agg(count(lit(1)).as("n_txs"), dsum(col("gas_usd")).as("sum_gas"),
        dsum(col("profit_usd")).as("sum_profit"))
      .select(lit("mev_block").as("kind"), col("block_number"),
        nullStr.as("mev_type"),
        md5(concat(lit("builder:"),
          col("block_number") % ChainFixture.NumBuilders)).as("key"),
        col("sum_gas").as("d1"), col("sum_profit").as("d2"),
        col("n_txs").as("n1"), nullL.as("n2"))

    bundleArm.unionByName(typeArm).unionByName(blockArm)
  }

  /** The shared three-drop streaming harness: writes tercile 0 as the
    * initial source, starts a checkpointed file-source stream whose
    * foreachBatch body (a) fails loudly on a missing predecessor tail,
    * (b) carries the predecessor tail forward across an empty micro-batch,
    * (c) unions the tail and calls `emit` with (session, full slice,
    * own-block bar, batch id) — the emitter owns its batch-id-overwrite
    * writes — and (d) overwrites the tail by batch id, then drops
    * terciles 1 and 2.
    *
    * Tercile cuts derive from (min, max) so a fixture whose block numbers
    * don't start near 0 still splits into three real drops, and the
    * non-empty-drops assertion shares ONE per-block rollup pass with the
    * cut derivation (blocks are dimension-sized) instead of scanning the
    * persisted source twice. */
  private def runTipStream(s: SparkSession, dir: String, tag: String)(
      emit: (SparkSession, DataFrame, Long, Long) => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    StreamOracle.deleteOnExit(tmp)
    val (src, tail, ckpt) = (s"$tmp/src", s"$tmp/tail", s"$tmp/ckpt")
    val data = ChainFixture.tracesTable(s, dir).persist()
    try {
      val perBlock = data.groupBy("block_number").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      require(perBlock.nonEmpty, "tip stream: source has no blocks")
      val (mn0, mx0) = (perBlock.keys.min, perBlock.keys.max)
      val (cut1, cut2) = (mn0 + (mx0 - mn0) / 3, mn0 + 2 * (mx0 - mn0) / 3)
      def terOf(b: Long) = if (b <= cut1) 0L else if (b <= cut2) 1L else 2L
      val counts = perBlock.groupMapReduce { case (b, _) => terOf(b) } {
        case (_, c) => c }(_ + _)
      require((0L to 2L).forall(counts.getOrElse(_, 0L) > 0),
        s"tip stream: tercile drops must all be non-empty, got $counts")
      val batched = data.withColumn("batch",
        when(col("block_number") <= cut1, 0L)
          .when(col("block_number") <= cut2, 1L).otherwise(2L))
      batched.filter(col("batch") === 0L).drop("batch")
        .coalesce(1).write.parquet(src)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", ShufflePartitions)
      val stream = s2.readStream
        .schema(data.schema).parquet(src)
      val q = stream.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, batchId: Long) =>
          val ss = b.sparkSession
          val bp = b.persist()
          try {
            val prev = new java.io.File(s"$tail/batch=${batchId - 1}")
            if (batchId > 0 && !prev.exists())
              sys.error(s"tip stream: predecessor tail missing for batch " +
                s"$batchId — refusing to inspect with a truncated window")
            val mm = bp.agg(min(col("block_number")),
              max(col("block_number"))).head()
            if (mm.isNullAt(0)) {
              // empty micro-batch: the window buffer must survive the gap
              if (batchId > 0)
                ss.read.parquet(prev.toString)
                  .write.mode("overwrite").parquet(s"$tail/batch=$batchId")
            } else {
              val (mn, mx) = (mm.getLong(0), mm.getLong(1))
              // union the predecessor's tail so this batch's leading-edge
              // 2-block windows are complete (multi_block_window buffer)
              val full =
                if (batchId > 0)
                  ss.read.parquet(prev.toString).unionByName(bp)
                else bp
              emit(ss, full, mn, batchId)
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
          batched.filter(col("batch") === i).drop("batch")
            .coalesce(1).write.mode("append").parquet(src)
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally { data.unpersist(false); () }
  }

  /** ONE tip stream per (JVM, sf dir): the reference runs a SINGLE
    * long-lived `TipInspector` carrying the whole inspector set and the
    * composer (tip.rs:34 — `inspectors: &[&dyn Inspector]`, one
    * `Processor`) and PERSISTS its results; consumers query the stored
    * tables, they never re-run the pipeline. Both tip entries here have
    * that shape: two output surfaces of the SAME streamed run — per
    * micro-batch the slice is classified and priced ONCE
    * (localCheckpointed — two emitters consume it, so the eager cut pays
    * for itself, unlike the single-consumer case the r14 negative result
    * measured), then the Q1+Q2+Q7 bundle union and the full-composer
    * output are each written batch-id-overwrite to their own directory.
    * Memoized per sf dir like the batch pipeline intermediates.
    *
    * Bench semantics (r16, fixing the r15 accounting flaw): Bench resets
    * this memo after its untimed warm pass, so the FIRST timed tip entry
    * drives the real checkpointed stream end-to-end and the second reads
    * the shared run's other output surface — the stream's cost is inside
    * the timed region exactly once (pipeline accounting, like the other
    * materialized intermediates). The CORRECTNESS gate always drives the
    * real stream. */
  private val tipRuns =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Rehearsal hook: drop the per-JVM memo so the next invocation drives
    * a FRESH checkpointed stream — the scale rehearsal times the
    * operator, not the stored-table read-back (a tip row therefore times
    * the whole shared run: both output surfaces). */
  private[graft] def resetTipRuns(): Unit = tipRuns.clear()
  private def sharedTipRun(s: SparkSession, dir: String): (String, String) =
    tipRuns.computeIfAbsent(dir, _ => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_r2out").toString
      StreamOracle.deleteOnExit(tmp)
      val (outI, outC) = (s"$tmp/out_inspect", s"$tmp/out_composer")
      runTipStream(s, dir, "r2tip") { (ss, full, mn, batchId) =>
        val slice = full.localCheckpoint()
        val acts = ChainFixture.actionsOf(ss, slice).localCheckpoint()
        val hdr = Accounting.headersOf(ss, slice, acts).localCheckpoint()
        // the inspector intermediates BOTH output surfaces consume are
        // computed once per micro-batch, like classify/price above — the
        // reference runs each inspector once per block and the composer
        // reads its results (tip.rs:34 `inspectors: &[&dyn Inspector]`);
        // before this cut the sandwich shrink pipeline (windowed explode +
        // self-join + victim stats) and the per-tx arb fold each ran TWICE
        // per batch, once per emitter (r16 A/B in OPTIMIZATION_r16.md)
        val sw = InspectorOps.swapsOf(acts)
        val swTx = InspectorOps.swTxFromSwaps(sw).localCheckpoint()
        val sand = InspectorOps.sandwichesOf(swTx).localCheckpoint()
        val arbs = InspectorOps.arbsOf(sw).localCheckpoint()
        inspectBundles(ss, slice, mn, Some(acts), Some(hdr), Some(sand),
            Some(arbs))
          .write.mode("overwrite").parquet(s"$outI/batch=$batchId")
        composedMevOf(ss, slice, mn, Some(acts), Some(hdr), Some(swTx),
            Some(sand), Some(arbs))
          .write.mode("overwrite").parquet(s"$outC/batch=$batchId")
      }
      (outI, outC)
    })

  private val r2TipInspect = QueryDef(
    "r2_tip_inspect",
    (s, dir) => s.read.parquet(sharedTipRun(s, dir)._1).drop("batch")
      .orderBy("btype", "block_number", "tx1", "tx2", "pool"),
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

  /** The full-composer tip entry: streamed classify → price → ALL seven
    * candidate surfaces → J10 dedup → A4 rollup, per micro-batch, hash-
    * matched against the batch composer formulation over all blocks. */
  private val r2TipComposer = QueryDef(
    "r2_tip_composer",
    (s, dir) => s.read.parquet(sharedTipRun(s, dir)._2).drop("batch")
      .orderBy("kind", "block_number", "mev_type", "key"),
    withCtes(s"""${InspectorOps.composerOracleCtes},
      tcsrch AS ${ChainFixture.searchersCteBody},
      tccexd AS (
        SELECT s.tx_hash, h.profit_usd, h.block_number, h.eoa,
          (se.s_eoa IS NOT NULL) AS labeled
        FROM (SELECT tx_hash FROM swaps GROUP BY 1 HAVING COUNT(*) = 1) s
        JOIN header h ON s.tx_hash = h.tx_hash
        LEFT JOIN tcsrch se ON h.eoa = se.s_eoa),
      tcb AS MATERIALIZED (
        SELECT mev_type || '|' || bid AS bid, mev_type, blk, profit, txs,
          arb_type, labeled, len(list_distinct(txs)) AS n_txs FROM (
          SELECT DISTINCT front_tx || '|' || back_tx || '|' || pool AS bid,
            'sandwich' AS mev_type, back_block AS blk,
            back_out - sum_in AS profit, [front_tx, back_tx] AS txs,
            CAST(NULL AS VARCHAR) AS arb_type, FALSE AS labeled FROM sand
          UNION ALL
          SELECT DISTINCT tx_hash || '|' || burn_tx || '|' || pool,
            'jit', block_number, 0.0e0, [tx_hash, burn_tx], NULL, FALSE
          FROM jitp
          UNION ALL
          SELECT l.tx_hash, 'liquidation', h.block_number, 0.0e0,
            [l.tx_hash], NULL, FALSE
          FROM (SELECT DISTINCT tx_hash FROM actions
                WHERE action_type = 'liquidation') l
          JOIN header h ON l.tx_hash = h.tx_hash
          UNION ALL
          SELECT a.tx_hash, 'arb', h.block_number, h.profit_usd,
            [a.tx_hash], a.arb_type, FALSE
          FROM arb a JOIN header h ON a.tx_hash = h.tx_hash
          UNION ALL
          SELECT tx_hash, 'cexdex', block_number, profit_usd, [tx_hash],
            NULL, labeled
          FROM tccexd
          UNION ALL
          SELECT DISTINCT b.front_tx || '|' || b.back_tx || '|'
              || j.tx_hash || '|' || j.burn_tx,
            'jit_sandwich', b.back_block, b.back_out - b.sum_in,
            [b.front_tx, b.back_tx, j.tx_hash, j.burn_tx], NULL, FALSE
          FROM brkt b JOIN jitp j
            ON b.back_block = j.block_number AND b.eoa = j.eoa
          UNION ALL
          SELECT DISTINCT j.tx_hash || '|' || j.burn_tx || '|' || c.tx_hash,
            'jit_cexdex', j.block_number, c.profit_usd,
            [j.tx_hash, j.burn_tx, c.tx_hash], NULL, FALSE
          FROM jitp j JOIN tccexd c
            ON j.block_number = c.block_number AND j.eoa = c.eoa)),
      tce AS MATERIALIZED (
        SELECT bid, mev_type, blk, n_txs, profit, arb_type, labeled,
          CAST(blk AS VARCHAR) || '|' || utx AS tx
        FROM (SELECT bid, mev_type, blk, n_txs, profit, arb_type, labeled,
                UNNEST(list_distinct(txs)) AS utx
              FROM tcb)),
      tcmx AS (SELECT * FROM (VALUES ${InspectorOps.ComposerMatrix
        .filterNot(p => p == ("arb", "cexdex") || p == ("cexdex", "arb"))
        .map { case (d, x) => s"('$d','$x')" }.mkString(", ")})
        t(dom_type, sub_type)),
      tcur AS (
        SELECT DISTINCT e.bid
        FROM tce e JOIN tcmx ON e.mev_type = tcmx.sub_type
        JOIN tce d ON d.tx = e.tx AND d.mev_type = tcmx.dom_type),
      tce1 AS (
        SELECT DISTINCT c.bid
        FROM tce c JOIN tce a
          ON c.mev_type = 'cexdex' AND a.mev_type = 'arb' AND a.tx = c.tx
         AND a.arb_type <> 'triangle' AND a.profit > c.profit
         AND NOT c.labeled),
      tce2 AS (
        SELECT DISTINCT a.bid
        FROM tce a JOIN (
            SELECT c.* FROM tce c LEFT JOIN tce1 k ON c.bid = k.bid
            WHERE c.mev_type = 'cexdex' AND k.bid IS NULL) cs
          ON a.mev_type = 'arb' AND a.tx = cs.tx),
      tcx AS MATERIALIZED (
        SELECT bid FROM tcur UNION SELECT bid FROM tce1
        UNION SELECT bid FROM tce2),
      tcs AS MATERIALIZED (
        SELECT e.* FROM tce e LEFT JOIN tcx x ON e.bid = x.bid
        WHERE x.bid IS NULL),
      tcw AS (
        SELECT DISTINCT e.bid FROM tcs e
        JOIN tcs o ON e.tx = o.tx AND e.mev_type = o.mev_type
          AND e.bid <> o.bid
          AND (o.n_txs > e.n_txs OR (o.n_txs = e.n_txs
            AND (o.profit < e.profit
              OR (o.profit = e.profit AND o.bid < e.bid))))),
      tcfin AS MATERIALIZED (
        SELECT b.*, (x.bid IS NOT NULL) AS xk, (w.bid IS NOT NULL) AS wk
        FROM tcb b
        LEFT JOIN tcx x ON b.bid = x.bid
        LEFT JOIN tcw w ON b.bid = w.bid)
      SELECT 'bundle' AS kind, blk AS block_number, mev_type, bid AS key,
        CAST(profit AS DOUBLE) AS d1, CAST(NULL AS DOUBLE) AS d2,
        CAST(n_txs AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2
      FROM tcfin WHERE NOT xk AND NOT wk
      UNION ALL
      SELECT 'type_count', blk, mev_type, CAST(NULL AS VARCHAR),
        CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        CAST(SUM(CASE WHEN NOT xk AND NOT wk THEN 1 ELSE 0 END) AS BIGINT),
        CAST(COUNT(*) AS BIGINT)
      FROM tcfin GROUP BY 2, 3
      UNION ALL
      SELECT 'mev_block', h.block_number, CAST(NULL AS VARCHAR),
        b.beneficiary,
        ${sqlSum("h.gas_usd")}, ${sqlSum("h.profit_usd")},
        COUNT(*), CAST(NULL AS BIGINT)
      FROM header h JOIN blocks b ON h.block_number = b.block_number
      GROUP BY 2, 4
      ORDER BY 1, 2, 3, 4"""))
}
