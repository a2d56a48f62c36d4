package graft.domain

import graft.ops.ExactAgg._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Accounting layer shared by every inspector (SURVEY §2.5 A1–A3, §2.4 J2):
  * token-delta fold, USD valuation, gas math, and the per-tx bundle header.
  *
  * Reference: `account_for_actions` (brontes-types/src/normalized_actions/
  * accounting.rs:19-56), `get_deltas_usd` + `build_bundle_header`
  * (brontes-inspect/src/mev_inspectors/shared_utils.rs:344-460), gas math
  * (brontes-types/src/tree/root.rs:362-381).
  *
  * Deltas are LONG-FORM rows (eoa, token, delta) — SURVEY §1.2's choice for
  * aggregability — produced by two projections of the actions table unioned
  * (no explode, no shuffle until the per-key rollup). Token USD prices are
  * a deterministic broadcast dimension; ETH_USD a constant, mirroring the
  * reference's per-block CexPriceMap lookup with a fixture-stable price.
  */
object Accounting {

  import ChainFixture._

  val EthUsd = 2000.0

  /** `MAX_PROFIT`/`MIN_PROFIT` (brontes-inspect/src/mev_inspectors/
    * mod.rs:12-13): a bundle profit at or beyond ±15M USD is treated as a
    * pricing artifact — the reference zeroes the profit and drops the
    * priced flag (liquidations.rs:121-124, searcher_activity.rs:106-109). */
  val MaxProfitUsd = 1.5e7

  /** Txs whose delta set touches a token with unknown decimals — the
    * per-token price lookup fails for these (`get_deltas_usd` → `None`,
    * shared_utils.rs:344-460), so the revenue side of the header is
    * unusable. This is C9's quarantine set viewed per-tx: one distinct
    * projection off the already-pruned actions scan, never a fact join. */
  def unpricedTxs(actionsDf: DataFrame): DataFrame =
    actionsDf.filter(
      (col("token_in_id").isNotNull && col("dec_in").isNull) ||
        (col("token_out_id").isNotNull && col("dec_out").isNull))
      .select("tx_hash").distinct()

  /** The priced-profit gate shared by the Liquidation and SearcherActivity
    * inspectors (liquidations.rs:100-124, searcher_activity.rs:86-109).
    * Input rows carry `revenue_usd`, `gas_usd` and an INT `priced`
    * (1 = every token in the tx's delta set has a known price). Emits
    *   profit_usd     — revenue − gas when priced and inside ±15M, else 0
    *   has_dex_price  — 1 only when the profit survived both checks
    * (the reference's `>= MAX_PROFIT || <= MIN_PROFIT` zeroing, boundary
    * inclusive). DataFrame-parameterized so golden scenarios drive the
    * same expression the registered queries run. */
  private[graft] def pricedProfitGate(df: DataFrame): DataFrame =
    df.withColumn("profit_raw",
        when(col("priced") === 1, col("revenue_usd") - col("gas_usd"))
          .otherwise(lit(0.0)))
      .withColumn("has_dex_price",
        when(col("priced") === 1 && col("profit_raw") < MaxProfitUsd &&
          col("profit_raw") > -MaxProfitUsd, 1).otherwise(0))
      .withColumn("profit_usd",
        when(col("has_dex_price") === 1, col("profit_raw")).otherwise(lit(0.0)))
      .drop("profit_raw", "priced")

  /** Oracle forms of [[pricedProfitGate]] (e-notation keeps DuckDB in
    * doubles; `raw` must be the revenue−gas expression, `priced` the 0/1
    * flag). */
  def sqlGateProfit(raw: String, priced: String): String =
    s"CASE WHEN $priced = 1 AND $raw < 1.5e7 AND $raw > -1.5e7 THEN $raw ELSE 0.0e0 END"
  def sqlGateFlag(raw: String, priced: String): String =
    s"CAST(CASE WHEN $priced = 1 AND $raw < 1.5e7 AND $raw > -1.5e7 THEN 1 ELSE 0 END AS INTEGER)"

  /** Deterministic token-price dimension (42 ids incl. quarantined 40/41) —
    * the DataFrame form of the single price surface [[ChainFixture.tokenPrice]]. */
  def tokenPrices(s: SparkSession): DataFrame =
    s.range(TokRefSpace).select(col("id").as("token_id"),
      tokenPrice(col("id")).as("price_usd"))

  /** A1: long-form (block, tx, tx_idx, eoa, token, delta) rows from actions. */
  def deltas(actions: DataFrame): DataFrame = {
    val base = Seq("block_number", "tx_idx", "tx_hash", "from_address").map(col)
    val ins = actions
      .filter(col("token_in_id").isNotNull && col("amount_in").isNotNull &&
        col("action_type").isin("swap", "transfer", "mint", "burn", "liquidation"))
      .select(base :+ col("token_in_id").as("token_id") :+
        when(col("action_type") === "burn", col("amount_in"))
          .otherwise(-col("amount_in")).as("delta"): _*)
    val outs = actions
      .filter(col("token_out_id").isNotNull && col("amount_out").isNotNull &&
        col("action_type").isin("swap", "mint", "burn", "liquidation"))
      .select(base :+ col("token_out_id").as("token_id") :+
        when(col("action_type") === "mint", -col("amount_out"))
          .otherwise(col("amount_out")).as("delta"): _*)
    ins.unionByName(outs).withColumnRenamed("from_address", "eoa")
  }

  /** F7: per-tx gas cost in USD (gas_used × effective price, ETH → USD). */
  def txGas(s: SparkSession, dir: String): DataFrame =
    txGasOf(tracesTable(s, dir))

  /** [[txGas]] parameterized over any traces-shaped frame (tip mode's
    * per-micro-batch gas math). The base fee is the deterministic per-block
    * function of block_number the [[ChainFixture.blocks]] dimension carries
    * — computed inline, so the slice needs no dimension join. Every term is
    * integer-valued, so the sum is exact and order-independent. */
  def txGasOf(tracesDf: DataFrame): DataFrame =
    tracesDf
      .withColumn("base_fee", lit(100L) + col("block_number") % 50)
      .groupBy("block_number", "tx_hash", "from_address")
      .agg((sum(col("gas_used") * (col("priority_fee") + col("base_fee"))) / 1e9 * EthUsd)
        .as("gas_usd"))
      .withColumnRenamed("from_address", "eoa")

  /** A2: per-tx USD revenue = Σ delta × token price. */
  def txRevenue(s: SparkSession, actionsDf: DataFrame): DataFrame =
    deltas(actionsDf)
      .join(broadcast(tokenPrices(s)), "token_id")
      .groupBy("tx_hash")
      .agg(dsumR(col("delta") * col("price_usd")).as("revenue_usd"))

  /** A3: bundle header — revenue − gas per tx, the row every inspector
    * attaches to its detections. Materialized like the reference's stored
    * bundle tables: ~9 queries read it. */
  def bundleHeaders(s: SparkSession, dir: String): DataFrame =
    ChainFixture.materialize(s, s"headers_${ChainFixture.dirKey(dir)}",
      headersOf(s, tracesTable(s, dir), actionsTable(s, dir)))

  /** [[bundleHeaders]] parameterized over traces/actions slices — the
    * per-micro-batch header build tip mode runs. Header rows are per-tx
    * rollups, so a slice's headers are bit-identical to the batch table's
    * rows for those txs. */
  def headersOf(s: SparkSession, tracesDf: DataFrame,
      actionsDf: DataFrame): DataFrame =
    txGasOf(tracesDf)
      .join(txRevenue(s, actionsDf), Seq("tx_hash"), "left")
      .withColumn("revenue_usd", coalesce(col("revenue_usd"), lit(0.0)))
      .withColumn("profit_usd", col("revenue_usd") - col("gas_usd"))

  // ── Oracle-side CTEs (appended after ChainFixture.sqlCtes) ────────────────

  /** Extra WITH-clause members: px, deltas, tx_gas, tx_rev, header, swaps. */
  val sqlAccountingCtes: String =
    s"""px AS (SELECT i AS token_id, ${tokenPriceSql("i")} AS price_usd
      FROM range($TokRefSpace) t(i)),
    deltas AS (
      SELECT block_number, tx_idx, tx_hash, from_address AS eoa,
        token_in_id AS token_id,
        CASE WHEN action_type = 'burn' THEN amount_in ELSE -amount_in END AS delta
      FROM actions
      WHERE token_in_id IS NOT NULL AND amount_in IS NOT NULL
        AND action_type IN ('swap','transfer','mint','burn','liquidation')
      UNION ALL
      SELECT block_number, tx_idx, tx_hash, from_address, token_out_id,
        CASE WHEN action_type = 'mint' THEN -amount_out ELSE amount_out END
      FROM actions
      WHERE token_out_id IS NOT NULL AND amount_out IS NOT NULL
        AND action_type IN ('swap','mint','burn','liquidation')),
    tx_gas AS (
      SELECT t.block_number, t.tx_hash, t.from_address AS eoa,
        SUM(t.gas_used * (t.priority_fee + b.base_fee)) / 1e9 * $EthUsd AS gas_usd
      FROM trace t JOIN blocks b ON t.block_number = b.block_number
      GROUP BY 1, 2, 3),
    tx_rev AS (
      SELECT d.tx_hash, ${sqlSumR("d.delta * px.price_usd")} AS revenue_usd
      FROM deltas d JOIN px ON d.token_id = px.token_id
      GROUP BY 1),
    header AS (
      SELECT g.block_number, g.tx_hash, g.eoa,
        COALESCE(r.revenue_usd, 0.0) AS revenue_usd, g.gas_usd,
        COALESCE(r.revenue_usd, 0.0) - g.gas_usd AS profit_usd
      FROM tx_gas g LEFT JOIN tx_rev r ON g.tx_hash = r.tx_hash),
    swaps AS (
      SELECT * FROM actions
      WHERE action_type = 'swap' AND amount_in IS NOT NULL AND amount_out IS NOT NULL)"""

  val sqlDomainCtes: String = s"${ChainFixture.sqlCtes}, $sqlAccountingCtes"
}
