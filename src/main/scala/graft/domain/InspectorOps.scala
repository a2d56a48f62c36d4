package graft.domain

import graft.{QueryDef, QueryModule}
import graft.ops.ExactAgg._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The inspectors (SURVEY §2.11 Q1–Q9) and their join machinery (§2.4
  * J6–J11) over the classified `actions` table — the reference's product
  * surface, re-expressed as window + equi-join dataflow.
  *
  * Reference semantics matched (under /root/reference/crates/brontes-inspect/):
  *   Q1 sandwich           src/mev_inspectors/sandwich/mod.rs:60-1148
  *   Q2 atomic arb         src/mev_inspectors/atomic_arb.rs:53-425
  *   Q5 JIT liquidity      src/mev_inspectors/jit/jit_liquidity.rs:26-700
  *   Q7 liquidations       src/mev_inspectors/liquidations.rs:18-160
  *   Q8 searcher activity  src/mev_inspectors/searcher_activity.rs:19-139
  *   Q9 composer           src/composer/mod.rs:71-253
  *   J7 pool overlap       sandwich/mod.rs:556-701
  *   J8 JIT bracket        jit/jit_liquidity.rs:160-464
  *   J10 MEV dedup         composer/mod.rs:190-231
  *   J11 JitSandwich       composer/composer_filters.rs:20-48
  *   W3 bounded shrink     sandwich/mod.rs:447-555
  *
  * Scale shape: every candidate join is EQUI-keyed on (block, pool) or
  * (block, eoa, pool) — the reference's per-block scan becomes a shuffle
  * partitioned by block-local keys, so a 100 TB backfill parallelizes by
  * block with no cross-block data motion; windows order by tx_idx within
  * those same keys. PnL joins the A3 header built in [[Accounting]].
  */
object InspectorOps extends QueryModule {

  import Accounting._
  import ChainFixture._

  def defs: Seq[QueryDef] = Seq(a3BundleHeader, q7Liquidations, q2AtomicArb,
    q8SearcherActivity, q1Sandwich, q5Jit, j7PoolOverlap, j8JitBracket,
    j10ComposerDedup, j11JitSandwich, q9MevBlock, w3ShrinkLoop)

  private def withCtes(sql: String) = Some(s"WITH $sqlDomainCtes, $sql")

  // ── shared Spark fragments ────────────────────────────────────────────────

  private def swaps(s: SparkSession, dir: String): DataFrame =
    actionsTable(s, dir).filter(col("action_type") === "swap" &&
      col("amount_in").isNotNull && col("amount_out").isNotNull)

  /** Per-(tx, pool) swap rollup — the sandwich candidate unit. Six queries
    * (q1/q5/j7/j10/j11/w3) read it → materialized like the other pipeline
    * intermediates. */
  private def swTx(s: SparkSession, dir: String): DataFrame =
    ChainFixture.materialize(s, s"swtx_${ChainFixture.dirKey(dir)}",
      swaps(s, dir).filter(col("pool").isNotNull)
        .groupBy("block_number", "tx_idx", "tx_hash", "from_address", "pool")
        .agg(min_by(col("direction"), col("trace_idx")).as("dir"),
          min_by(col("token_in_id"), col("trace_idx")).as("tok_in"),
          dsum(col("amount_in")).as("sum_in"),
          dsum(col("amount_out")).as("sum_out"))
        .withColumnRenamed("from_address", "eoa"))

  /** J6 bracket: consecutive opposite-direction same-pool txs by one EOA.
    * Operates on any swTx-shaped frame (unit-testable on planted data). */
  private[graft] def bracketsOf(swTxDf: DataFrame): DataFrame = {
    val w = Window.partitionBy("block_number", "eoa", "pool").orderBy("tx_idx")
    swTxDf
      .withColumn("back_idx", lead(col("tx_idx"), 1).over(w))
      .withColumn("back_dir", lead(col("dir"), 1).over(w))
      .withColumn("back_out", lead(col("sum_out"), 1).over(w))
      .withColumn("back_tx", lead(col("tx_hash"), 1).over(w))
      .filter(col("back_idx").isNotNull && col("dir") =!= col("back_dir"))
      .select(col("block_number"), col("eoa"), col("pool"),
        col("tx_idx").as("front_idx"), col("tx_hash").as("front_tx"),
        col("dir"), col("tok_in"), col("sum_in"),
        col("back_idx"), col("back_out"), col("back_tx"))
  }

  private def brackets(s: SparkSession, dir: String): DataFrame =
    bracketsOf(swTx(s, dir))

  /** Sandwiches: brackets with ≥1 same-direction victim strictly between. */
  private[graft] def sandwichesOf(swTxDf: DataFrame): DataFrame = {
    val b = bracketsOf(swTxDf)
    val v = swTxDf.select(col("block_number").as("v_block"),
      col("pool").as("v_pool"), col("tx_idx").as("v_idx"),
      col("eoa").as("v_eoa"), col("dir").as("v_dir"))
    b.join(v, col("v_block") === col("block_number") && col("v_pool") === col("pool") &&
        col("v_idx") > col("front_idx") && col("v_idx") < col("back_idx") &&
        col("v_eoa") =!= col("eoa") && col("v_dir") === col("dir"))
      .groupBy("block_number", "eoa", "pool", "front_idx", "front_tx", "back_tx",
        "tok_in", "sum_in", "back_out")
      .agg(count(lit(1)).as("n_victims"))
  }

  private def sandwiches(s: SparkSession, dir: String): DataFrame =
    sandwichesOf(swTx(s, dir))

  /** Q2 candidates: cyclic continuous swap sequences within a tx.
    * Operates on any swaps-shaped frame (unit-testable on planted data). */
  private[graft] def arbsOf(swapsDf: DataFrame): DataFrame = {
    val w = Window.partitionBy("tx_hash").orderBy("trace_idx")
    swapsDf
      .withColumn("nxt_in", lead(col("token_in_id"), 1).over(w))
      .groupBy("tx_hash")
      .agg(count(lit(1)).as("n_swaps"),
        bool_and(col("nxt_in").isNull || col("token_out_id") === col("nxt_in")).as("cont"),
        min_by(col("token_in_id"), col("trace_idx")).as("first_in"),
        max_by(col("token_out_id"), col("trace_idx")).as("last_out"),
        min(col("token_in_id")).as("min_tok"))
      .filter(col("n_swaps") >= 2 && col("cont") && col("first_in") === col("last_out"))
      .withColumn("arb_type",
        when(col("n_swaps") === 2, "cross_pair")
          .when(col("n_swaps") === 3, "triangle")
          .when(col("min_tok") < 5, "stablecoin")
          .otherwise("long_tail"))
  }

  private def arbs(s: SparkSession, dir: String): DataFrame =
    arbsOf(swaps(s, dir))

  /** J8: mint immediately followed by burn on the same (block, eoa, pool). */
  private def jitPairs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("block_number", "from_address", "pool")
      .orderBy("tx_idx", "trace_idx")
    actionsTable(s, dir)
      .filter(col("action_type").isin("mint", "burn") && col("pool").isNotNull)
      .withColumn("nxt", lead(col("action_type"), 1).over(w))
      .withColumn("nxt_idx", lead(col("tx_idx"), 1).over(w))
      .filter(col("action_type") === "mint" && col("nxt") === "burn")
      .select(col("block_number"), col("from_address").as("eoa"), col("pool"),
        col("tx_hash"), col("tx_idx").as("mint_idx"), col("nxt_idx").as("burn_idx"),
        col("protocol"))
  }

  // ── shared oracle fragments ───────────────────────────────────────────────

  private val swTxCte =
    s"""sw_tx AS (
      SELECT block_number, tx_idx, tx_hash, from_address AS eoa, pool,
        ARG_MIN(direction, trace_idx) AS dir,
        ARG_MIN(token_in_id, trace_idx) AS tok_in,
        ${sqlSum("amount_in")} AS sum_in, ${sqlSum("amount_out")} AS sum_out
      FROM swaps WHERE pool IS NOT NULL
      GROUP BY 1, 2, 3, 4, 5)"""

  private val brktCte =
    """brkt AS (
      SELECT * FROM (
        SELECT block_number, eoa, pool, tx_idx AS front_idx, tx_hash AS front_tx,
          dir, tok_in, sum_in,
          LEAD(tx_idx) OVER w AS back_idx, LEAD(dir) OVER w AS back_dir,
          LEAD(sum_out) OVER w AS back_out, LEAD(tx_hash) OVER w AS back_tx
        FROM sw_tx
        WINDOW w AS (PARTITION BY block_number, eoa, pool ORDER BY tx_idx))
      WHERE back_idx IS NOT NULL AND dir <> back_dir)"""

  private val sandCte =
    """sand AS (
      SELECT b.block_number, b.eoa, b.pool, b.front_idx, b.front_tx, b.back_tx,
        b.tok_in, b.sum_in, b.back_out, COUNT(*) AS n_victims
      FROM brkt b JOIN sw_tx v
        ON v.block_number = b.block_number AND v.pool = b.pool
       AND v.tx_idx > b.front_idx AND v.tx_idx < b.back_idx
       AND v.eoa <> b.eoa AND v.dir = b.dir
      GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9)"""

  private val arbCte =
    """arb AS (
      SELECT tx_hash, n_swaps,
        CASE WHEN n_swaps = 2 THEN 'cross_pair'
             WHEN n_swaps = 3 THEN 'triangle'
             WHEN min_tok < 5 THEN 'stablecoin'
             ELSE 'long_tail' END AS arb_type
      FROM (
        SELECT tx_hash, COUNT(*) AS n_swaps,
          BOOL_AND(nxt_in IS NULL OR token_out_id = nxt_in) AS cont,
          ARG_MIN(token_in_id, trace_idx) AS first_in,
          ARG_MAX(token_out_id, trace_idx) AS last_out,
          MIN(token_in_id) AS min_tok
        FROM (SELECT *, LEAD(token_in_id) OVER (
                PARTITION BY tx_hash ORDER BY trace_idx) AS nxt_in FROM swaps)
        GROUP BY 1)
      WHERE n_swaps >= 2 AND cont AND first_in = last_out)"""

  private val jitpCte =
    """jitp AS (
      SELECT block_number, eoa, pool, tx_hash, tx_idx AS mint_idx,
        nxt_idx AS burn_idx, protocol
      FROM (
        SELECT block_number, from_address AS eoa, pool, tx_hash, tx_idx,
          action_type, protocol,
          LEAD(action_type) OVER w AS nxt, LEAD(tx_idx) OVER w AS nxt_idx
        FROM actions WHERE action_type IN ('mint','burn') AND pool IS NOT NULL
        WINDOW w AS (PARTITION BY block_number, from_address, pool
                     ORDER BY tx_idx, trace_idx))
      WHERE action_type = 'mint' AND nxt = 'burn')"""

  // ── queries ───────────────────────────────────────────────────────────────

  /** A3: bundle header build — revenue − gas per tx, rolled up per EOA. */
  private val a3BundleHeader = QueryDef(
    "a3_bundle_header",
    (s, dir) => bundleHeaders(s, dir)
      .groupBy("eoa")
      .agg(count(lit(1)).as("n_txs"),
        dsum(col("revenue_usd")).as("sum_revenue"),
        dsum(col("gas_usd")).as("sum_gas"),
        dsum(col("profit_usd")).as("sum_profit"))
      .orderBy("eoa"),
    Some(s"""WITH ${Accounting.sqlDomainCtes}
      SELECT eoa, COUNT(*) AS n_txs,
        ${sqlSum("revenue_usd")} AS sum_revenue,
        ${sqlSum("gas_usd")} AS sum_gas,
        ${sqlSum("profit_usd")} AS sum_profit
      FROM header GROUP BY 1 ORDER BY 1"""))

  /** Q7: liquidation inspector — per-block rollup of liquidation-bearing
    * txs with header PnL. */
  private val q7Liquidations = QueryDef(
    "q7_liquidations",
    (s, dir) => {
      val liq = actionsTable(s, dir).filter(col("action_type") === "liquidation")
        .groupBy("tx_hash").agg(count(lit(1)).as("n_liq"))
      liq.join(bundleHeaders(s, dir), "tx_hash")
        .groupBy("block_number")
        .agg(count(lit(1)).as("n_liq_txs"),
          sum(col("n_liq")).as("n_liquidations"),
          dsum(col("profit_usd")).as("sum_profit"),
          dsum(col("gas_usd")).as("sum_gas"))
        .orderBy("block_number")
    },
    withCtes(s"""liqtx AS (
        SELECT tx_hash, COUNT(*) AS n_liq FROM actions
        WHERE action_type = 'liquidation' GROUP BY 1)
      SELECT h.block_number, COUNT(*) AS n_liq_txs,
        CAST(SUM(l.n_liq) AS BIGINT) AS n_liquidations,
        ${sqlSum("h.profit_usd")} AS sum_profit,
        ${sqlSum("h.gas_usd")} AS sum_gas
      FROM liqtx l JOIN header h ON l.tx_hash = h.tx_hash
      GROUP BY 1 ORDER BY 1"""))

  /** Q2: atomic arbitrage — cyclic continuous swap paths classified
    * Triangle / CrossPair / Stablecoin / LongTail (backrun.rs:54), PnL from
    * the A3 header. */
  private val q2AtomicArb = QueryDef(
    "q2_atomic_arb",
    (s, dir) => {
      val searchers = s.range(4)
        .select(md5(concat(lit("eoa:"), col("id"))).as("s_eoa"))
      arbs(s, dir)
        .join(bundleHeaders(s, dir), "tx_hash")
        .join(broadcast(searchers), col("eoa") === col("s_eoa"), "left")
        // validity heuristic (atomic_arb.rs:180-198): profitable OR known
        // searcher OR an outsized bribe (gas spend)
        .withColumn("is_valid", col("profit_usd") > 0 ||
          col("s_eoa").isNotNull || col("gas_usd") > 50.0)
        .groupBy("arb_type")
        .agg(count(lit(1)).as("n_arbs"),
          dsum(col("profit_usd")).as("sum_profit"),
          sum(when(col("profit_usd") > 0, 1L).otherwise(0L)).as("n_profitable"),
          sum(when(col("is_valid"), 1L).otherwise(0L)).as("n_valid"))
        .orderBy("arb_type")
    },
    withCtes(s"""$arbCte,
      searchers2 AS (SELECT md5('eoa:' || i) AS s_eoa FROM range(4) t(i))
      SELECT a.arb_type, COUNT(*) AS n_arbs,
        ${sqlSum("h.profit_usd")} AS sum_profit,
        CAST(SUM(CASE WHEN h.profit_usd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_profitable,
        CAST(SUM(CASE WHEN h.profit_usd > 0 OR s.s_eoa IS NOT NULL
                       OR h.gas_usd > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
      FROM arb a JOIN header h ON a.tx_hash = h.tx_hash
      LEFT JOIN searchers2 s ON h.eoa = s.s_eoa
      GROUP BY 1 ORDER BY 1"""))

  /** Q8: searcher-activity — profit attribution for the labeled searcher
    * set (a broadcast dimension, J1's lookup shape). */
  private val q8SearcherActivity = QueryDef(
    "q8_searcher_activity",
    (s, dir) => {
      val searchers = s.range(4)
        .select(md5(concat(lit("eoa:"), col("id"))).as("eoa"))
      bundleHeaders(s, dir)
        .join(broadcast(searchers), "eoa")
        .groupBy("eoa")
        .agg(count(lit(1)).as("n_txs"),
          dsum(col("profit_usd")).as("sum_profit"),
          sum(when(col("profit_usd") > 0, 1L).otherwise(0L)).as("n_profitable"))
        .orderBy("eoa")
    },
    withCtes(s"""searchers AS (SELECT md5('eoa:' || i) AS eoa FROM range(4) t(i))
      SELECT h.eoa, COUNT(*) AS n_txs,
        ${sqlSum("h.profit_usd")} AS sum_profit,
        CAST(SUM(CASE WHEN h.profit_usd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_profitable
      FROM header h JOIN searchers s ON h.eoa = s.eoa
      GROUP BY 1 ORDER BY 1"""))

  /** Q1: sandwich inspector — J6 brackets + J7 victim checks, revenue =
    * back-run output minus front-run input priced in the frontrun token. */
  private val q1Sandwich = QueryDef(
    "q1_sandwich",
    (s, dir) => sandwiches(s, dir)
      .withColumn("revenue_usd",
        (col("back_out") - col("sum_in")) * (lit(1.0) + col("tok_in") * 0.1))
      .groupBy("block_number")
      .agg(count(lit(1)).as("n_sandwiches"),
        sum(col("n_victims")).as("n_victims"),
        dsum(col("revenue_usd")).as("sum_revenue"))
      .orderBy("block_number"),
    withCtes(s"""$swTxCte, $brktCte, $sandCte
      SELECT block_number, COUNT(*) AS n_sandwiches,
        CAST(SUM(n_victims) AS BIGINT) AS n_victims,
        ${sqlSum("(back_out - sum_in) * (1.0 + tok_in * 0.1)")} AS sum_revenue
      FROM sand GROUP BY 1 ORDER BY 1"""))

  /** Q5: JIT liquidity — mint→burn bracket (J8) with ≥1 victim swap in
    * between; fee revenue = burn minus mint amounts priced per token. */
  private val q5Jit = QueryDef(
    "q5_jit",
    (s, dir) => {
      val a = actionsTable(s, dir).persist()
      def side(t: String, agg: Column => Column, idxName: String) = a
        .filter(col("action_type") === t && col("pool").isNotNull &&
          col("amount_in").isNotNull && col("amount_out").isNotNull)
        .groupBy(col("block_number"), col("from_address").as("eoa"), col("pool"))
        .agg(agg(col("tx_idx")).as(idxName),
          min_by(col("token_in_id"), col("trace_idx")).as(s"${t}_t0"),
          min_by(col("token_out_id"), col("trace_idx")).as(s"${t}_t1"),
          dsum(col("amount_in")).as(s"${t}_in"),
          dsum(col("amount_out")).as(s"${t}_out"))
      val m = side("mint", min, "mint_idx")
      val b = side("burn", max, "burn_idx")
      val jit = m.join(b, Seq("block_number", "eoa", "pool"))
        .filter(col("mint_idx") < col("burn_idx"))
      val v = swTx(s, dir).select(col("block_number").as("v_block"),
        col("pool").as("v_pool"), col("tx_idx").as("v_idx"), col("eoa").as("v_eoa"))
      jit.join(v, col("v_block") === col("block_number") && col("v_pool") === col("pool") &&
          col("v_idx") > col("mint_idx") && col("v_idx") < col("burn_idx") &&
          col("v_eoa") =!= col("eoa"))
        .groupBy("block_number", "eoa", "pool", "mint_idx", "burn_idx",
          "mint_t0", "mint_t1", "mint_in", "mint_out", "burn_in", "burn_out")
        .agg(count(lit(1)).as("n_victims"))
        .withColumn("fee_usd",
          (col("burn_in") - col("mint_in")) * (lit(1.0) + col("mint_t0") * 0.1) +
            (col("burn_out") - col("mint_out")) * (lit(1.0) + col("mint_t1") * 0.1))
        .groupBy("block_number")
        .agg(count(lit(1)).as("n_jit"), sum(col("n_victims")).as("n_victims"),
          dsum(col("fee_usd")).as("sum_fee_usd"))
        .orderBy("block_number")
    },
    withCtes(s"""$swTxCte,
      mside AS (
        SELECT block_number, from_address AS eoa, pool, MIN(tx_idx) AS mint_idx,
          ARG_MIN(token_in_id, trace_idx) AS mint_t0,
          ARG_MIN(token_out_id, trace_idx) AS mint_t1,
          ${sqlSum("amount_in")} AS mint_in, ${sqlSum("amount_out")} AS mint_out
        FROM actions WHERE action_type = 'mint' AND pool IS NOT NULL
          AND amount_in IS NOT NULL AND amount_out IS NOT NULL
        GROUP BY 1, 2, 3),
      bside AS (
        SELECT block_number, from_address AS eoa, pool, MAX(tx_idx) AS burn_idx,
          ${sqlSum("amount_in")} AS burn_in, ${sqlSum("amount_out")} AS burn_out
        FROM actions WHERE action_type = 'burn' AND pool IS NOT NULL
          AND amount_in IS NOT NULL AND amount_out IS NOT NULL
        GROUP BY 1, 2, 3),
      jit AS (
        SELECT m.*, b.burn_idx, b.burn_in, b.burn_out
        FROM mside m JOIN bside b USING (block_number, eoa, pool)
        WHERE m.mint_idx < b.burn_idx),
      jitv AS (
        SELECT j.block_number, j.eoa, j.pool, j.mint_idx, j.burn_idx,
          j.mint_t0, j.mint_t1, j.mint_in, j.mint_out, j.burn_in, j.burn_out,
          COUNT(*) AS n_victims
        FROM jit j JOIN sw_tx v
          ON v.block_number = j.block_number AND v.pool = j.pool
         AND v.tx_idx > j.mint_idx AND v.tx_idx < j.burn_idx AND v.eoa <> j.eoa
        GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
      SELECT block_number, COUNT(*) AS n_jit,
        CAST(SUM(n_victims) AS BIGINT) AS n_victims,
        ${sqlSum("(burn_in - mint_in) * (1.0 + mint_t0 * 0.1) + (burn_out - mint_out) * (1.0 + mint_t1 * 0.1)")} AS sum_fee_usd
      FROM jitv GROUP BY 1 ORDER BY 1"""))

  /** J7: pool-overlap check — first vs last swap tx of an EOA in a block
    * must share a pool for the sandwich candidate to survive. */
  private val j7PoolOverlap = QueryDef(
    "j7_pool_overlap",
    (s, dir) => {
      val pt = swTx(s, dir).select("block_number", "eoa", "tx_idx", "pool").distinct().persist()
      val fl = pt.groupBy("block_number", "eoa")
        .agg(min(col("tx_idx")).as("ft"), max(col("tx_idx")).as("lt"),
          countDistinct(col("tx_idx")).as("nt"))
        .filter(col("nt") >= 2)
      // the two sides rename `pool` distinctly — a bare self-join on the
      // same lineage would collapse `pool === pool` to trivially-true
      val fp = pt.select(col("block_number").as("f_block"), col("eoa").as("f_eoa"),
        col("tx_idx").as("f_idx"), col("pool").as("f_pool"))
      val lp = pt.select(col("block_number").as("l_block"), col("eoa").as("l_eoa"),
        col("tx_idx").as("l_idx"), col("pool").as("l_pool"))
      val overlap = fl
        .join(fp, col("f_block") === col("block_number") && col("f_eoa") === col("eoa") &&
          col("f_idx") === col("ft"))
        .join(lp, col("l_block") === col("block_number") && col("l_eoa") === col("eoa") &&
          col("l_idx") === col("lt") && col("l_pool") === col("f_pool"))
        .groupBy("block_number", "eoa").agg(count(lit(1)).as("n_overlap"))
      fl.join(overlap, Seq("block_number", "eoa"), "left")
        .groupBy("block_number")
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col("n_overlap").isNotNull, 1L).otherwise(0L)).as("n_with_overlap"))
        .orderBy("block_number")
    },
    withCtes(s"""$swTxCte,
      pt AS (SELECT DISTINCT block_number, eoa, tx_idx, pool FROM sw_tx),
      fl AS (SELECT block_number, eoa, MIN(tx_idx) AS ft, MAX(tx_idx) AS lt
             FROM pt GROUP BY 1, 2 HAVING COUNT(DISTINCT tx_idx) >= 2),
      ovl AS (
        SELECT fl.block_number, fl.eoa, COUNT(*) AS n_overlap
        FROM fl
        JOIN pt f ON f.block_number = fl.block_number AND f.eoa = fl.eoa AND f.tx_idx = fl.ft
        JOIN pt l ON l.block_number = fl.block_number AND l.eoa = fl.eoa AND l.tx_idx = fl.lt
               AND l.pool = f.pool
        GROUP BY 1, 2)
      SELECT fl.block_number, COUNT(*) AS n_checked,
        CAST(SUM(CASE WHEN o.n_overlap IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_overlap
      FROM fl LEFT JOIN ovl o ON fl.block_number = o.block_number AND fl.eoa = o.eoa
      GROUP BY 1 ORDER BY 1"""))

  /** J8: the JIT bracket join alone — mint immediately followed by burn on
    * the same (block, eoa, pool), per protocol. */
  private val j8JitBracket = QueryDef(
    "j8_jit_bracket",
    (s, dir) => jitPairs(s, dir)
      .groupBy("protocol")
      .agg(count(lit(1)).as("n_brackets"),
        countDistinct(col("pool")).as("n_pools"))
      .orderBy("protocol"),
    withCtes(s"""$jitpCte
      SELECT protocol, COUNT(*) AS n_brackets,
        CAST(COUNT(DISTINCT pool) AS BIGINT) AS n_pools
      FROM jitp GROUP BY 1 ORDER BY 1"""))

  /** J10: composer dedup — overlapping candidate bundles resolved by MEV
    * priority (sandwich > jit > liquidation > arb), one bundle per tx. */
  private val j10ComposerDedup = QueryDef(
    "j10_composer_dedup",
    (s, dir) => {
      val sand = sandwiches(s, dir).select(col("front_tx").as("tx_hash"))
        .withColumn("mev_type", lit("sandwich")).withColumn("prio", lit(4))
      val jit = jitPairs(s, dir).select(col("tx_hash"))
        .withColumn("mev_type", lit("jit")).withColumn("prio", lit(3))
      val liq = actionsTable(s, dir).filter(col("action_type") === "liquidation")
        .select("tx_hash").distinct()
        .withColumn("mev_type", lit("liquidation")).withColumn("prio", lit(2))
      val arb = arbs(s, dir).select(col("tx_hash"))
        .withColumn("mev_type", lit("arb")).withColumn("prio", lit(1))
      val all = sand.unionByName(jit).unionByName(liq).unionByName(arb).distinct()
      val w = Window.partitionBy("tx_hash").orderBy(col("prio").desc, col("mev_type").asc)
      all.withColumn("rn", row_number().over(w))
        .groupBy("mev_type")
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_final"))
        .orderBy("mev_type")
    },
    withCtes(s"""$swTxCte, $brktCte, $sandCte, $arbCte, $jitpCte,
      cand AS (
        SELECT DISTINCT tx_hash, mev_type, prio FROM (
          SELECT front_tx AS tx_hash, 'sandwich' AS mev_type, 4 AS prio FROM sand
          UNION ALL SELECT tx_hash, 'jit', 3 FROM jitp
          UNION ALL SELECT DISTINCT tx_hash, 'liquidation', 2 FROM actions
            WHERE action_type = 'liquidation'
          UNION ALL SELECT tx_hash, 'arb', 1 FROM arb)),
      ranked AS (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY tx_hash ORDER BY prio DESC, mev_type ASC) AS rn FROM cand)
      SELECT mev_type, COUNT(*) AS n_raw,
        CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_final
      FROM ranked GROUP BY 1 ORDER BY 1"""))

  /** J11: JitSandwich composition — (block, eoa) present in both the
    * sandwich-bracket and JIT-bracket candidate sets. */
  private val j11JitSandwich = QueryDef(
    "j11_jit_sandwich",
    (s, dir) => {
      val b = brackets(s, dir).select("block_number", "eoa").distinct()
      val j = jitPairs(s, dir).select("block_number", "eoa").distinct()
      b.join(j, Seq("block_number", "eoa"))
        .agg(count(lit(1)).as("n_composed"),
          countDistinct(col("block_number")).as("n_blocks"))
    },
    withCtes(s"""$swTxCte, $brktCte, $jitpCte
      SELECT COUNT(*) AS n_composed,
        CAST(COUNT(DISTINCT block_number) AS BIGINT) AS n_blocks
      FROM (SELECT DISTINCT block_number, eoa FROM brkt) b
      JOIN (SELECT DISTINCT block_number, eoa FROM jitp) j USING (block_number, eoa)"""))

  /** Q9/A4: MevBlock rollup — per-block bundle counts by type + builder +
    * gas/profit totals (the composer's final block row). */
  private val q9MevBlock = QueryDef(
    "q9_mev_block",
    (s, dir) => {
      val bh = bundleHeaders(s, dir).persist()
      val hdr = bh
        .groupBy("block_number")
        .agg(count(lit(1)).as("n_txs"), dsum(col("gas_usd")).as("sum_gas"),
          dsum(col("profit_usd")).as("sum_profit"))
      val sand = sandwiches(s, dir).groupBy("block_number")
        .agg(count(lit(1)).as("n_sandwich"))
      val arb = arbs(s, dir)
        .join(bh.select("tx_hash", "block_number"), "tx_hash")
        .groupBy("block_number").agg(count(lit(1)).as("n_arb"))
      val b = blocks(s, dir)
      hdr.join(sand, Seq("block_number"), "left")
        .join(arb, Seq("block_number"), "left")
        .join(broadcast(b.select("block_number", "beneficiary")), "block_number")
        .select(col("block_number"), col("beneficiary"), col("n_txs"),
          coalesce(col("n_sandwich"), lit(0L)).as("n_sandwich"),
          coalesce(col("n_arb"), lit(0L)).as("n_arb"),
          col("sum_gas"), col("sum_profit"))
        .orderBy("block_number")
    },
    withCtes(s"""$swTxCte, $brktCte, $sandCte, $arbCte,
      hdrblk AS (
        SELECT block_number, COUNT(*) AS n_txs,
          ${sqlSum("gas_usd")} AS sum_gas, ${sqlSum("profit_usd")} AS sum_profit
        FROM header GROUP BY 1),
      sandblk AS (SELECT block_number, COUNT(*) AS n_sandwich FROM sand GROUP BY 1),
      arbblk AS (
        SELECT h.block_number, COUNT(*) AS n_arb
        FROM arb a JOIN header h ON a.tx_hash = h.tx_hash GROUP BY 1)
      SELECT h.block_number, b.beneficiary, h.n_txs,
        COALESCE(s.n_sandwich, 0) AS n_sandwich,
        COALESCE(a.n_arb, 0) AS n_arb, h.sum_gas, h.sum_profit
      FROM hdrblk h
      LEFT JOIN sandblk s ON h.block_number = s.block_number
      LEFT JOIN arbblk a ON h.block_number = a.block_number
      JOIN blocks b ON h.block_number = b.block_number
      ORDER BY 1"""))

  /** W3: bounded shrink verification — brackets with no victims shrink
    * their back boundary toward the midpoint for ≤6 deterministic rounds,
    * re-running the victim check each round (the reference's recursive
    * sandwich shrink, driver-side bounded loop per SURVEY §4.3). Iterative →
    * no single SQL oracle; the driver records a rows-only check. */
  private val w3ShrinkLoop = QueryDef(
    "w3_shrink_loop",
    (s, dir) => {
      val v = swTx(s, dir).select(col("block_number").as("v_block"),
        col("pool").as("v_pool"), col("tx_idx").as("v_idx"),
        col("eoa").as("v_eoa"), col("dir").as("v_dir")).persist()
      def victimCount(cand: DataFrame): DataFrame = cand
        .join(v, col("v_block") === col("block_number") && col("v_pool") === col("pool") &&
          col("v_idx") > col("front_idx") && col("v_idx") < col("back_idx") &&
          col("v_eoa") =!= col("eoa") && col("v_dir") === col("dir"), "left")
        .groupBy(cand.columns.toIndexedSeq.map(col): _*)
        .agg(count(col("v_idx")).as("n_victims"))
      var cand = brackets(s, dir)
        .select("block_number", "eoa", "pool", "front_idx", "back_idx", "dir")
      var results = Seq.empty[DataFrame]
      for (iter <- 0 until 6) {
        val counted = victimCount(cand).persist()
        results = results :+ counted.filter(col("n_victims") >= 1)
          .withColumn("found_at_iter", lit(iter))
        // shrink: pull the back boundary toward the front by halving the gap
        cand = counted.filter(col("n_victims") === 0)
          .withColumn("back_idx",
            col("front_idx") + ceil((col("back_idx") - col("front_idx")) / 2))
          .filter(col("back_idx") > col("front_idx") + 1)
          .drop("n_victims")
      }
      results.reduce(_ unionByName _)
        .groupBy("found_at_iter")
        .agg(count(lit(1)).as("n_valid"), sum(col("n_victims")).as("n_victims"))
        .orderBy("found_at_iter")
    },
    None)
}
