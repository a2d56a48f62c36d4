package graft.domain

import graft.QueryDef
import graft.functions.AbiCalldata.{abi_address, abi_log_word, abi_word}
import graft.ops.ExactAgg.{dsum, sqlSum}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** REAL public ABI layouts ported end-to-end from the reference's
  * classifier corpus (VERDICT r11 stretch #8) — not the five synthetic
  * breadth layouts, but the concrete argument/event shapes of two named
  * protocols, decoded from real bytes through codegen'd expressions:
  *
  *   - Maker PSM `buyGem(address usr, uint256 gemAmt)` /
  *     `sellGem(address usr, uint256 gemAmt)`
  *     (brontes-classifier/src/classifiers/maker/psm.rs): word0 is an
  *     ADDRESS (12-byte zero pad + 20 address bytes — a decode shape no
  *     other layout here has, [[graft.functions.AbiAddress]]), word1 the
  *     gem amount; the FEE rides the BuyGem/SellGem EVENT LOG, and the
  *     DAI-side amount COMBINES calldata and log: buy `amount_in =
  *     gemAmt + gemAmt·fee`, sell `amount_out = gemAmt − gemAmt·fee`
  *     (psm.rs:40-47, :90-97). token0 is always DAI, token1 the gem,
  *     both resolved from the pool registry (psm.rs:29-34).
  *
  *   - Curve metapool-impl `exchange_underlying(int128 i, int128 j,
  *     uint256 dx, uint256 min_dy)`
  *     (classifiers/curve/swaps/v1_meta.rs exchange_underlying_0):
  *     amounts AND coin ids come from the `TokenExchangeUnderlying` LOG
  *     (sold_id ‖ tokens_sold ‖ bought_id ‖ tokens_bought — v1_meta.rs
  *     `log.tokens_sold`), token identity resolves through the (pool,
  *     coin_index) registry, and — the impl is DELEGATECALLED — the pool
  *     is the CALLING contract, `info.from_address`, not the call target
  *     (v1_meta.rs `pool: info.from_address`). The calldata is decoded
  *     too and cross-checked against the log, since the reference trusts
  *     the log over the args.
  *
  * Selectors stay fixture-derived (no keccak in-container); the WORD
  * layouts, decode sources, and amount math are the reference's. Packing
  * is in-query (builtin concat/hex stay codegen'd) and every oracle
  * recomputes the aggregates from the SOURCE integer columns —
  * decode-vs-ground-truth, the c1_ext_family pattern.
  *
  * Scale shape: one trace scan each, broadcast dimension joins only, all
  * decode expressions inside whole-stage codegen (PlanSpec pins
  * no-fallback for the f5 family; these reuse the same expression set
  * plus [[graft.functions.AbiAddress]]).
  */
object RealAbiOps extends graft.QueryModule {

  import ChainFixture._

  def defs: Seq[QueryDef] = Seq(c1PsmSwap, c1CurveUnderlying)

  private def withCtes(sql: String) = Some(s"WITH ${ChainFixture.sqlCtes} $sql")

  private def word(c: Column) = lpad(lower(hex(c)), 64, "0")

  /** The PSM decode core on any frame with (calldata, log_data, is_buy):
    * usr from the address word, gemAmt from calldata word1, fee (bps, DAI
    * side) from the event log's word1, and the DAI leg combining them —
    * buy `amount_in = out + out·fee`, sell `amount_out = in − in·fee`
    * (psm.rs:40-47, :90-97). Unit-tested on planted bytes in the
    * reference's per-classifier test shape (psm equality asserts like
    * v1_meta.rs:228-340). */
  private[graft] def psmDecode(t: org.apache.spark.sql.DataFrame) = t
    .withColumn("usr", abi_address(col("calldata"), 0))
    .withColumn("gem_amt", abi_word(col("calldata"), 1))
    .withColumn("fee_dec", abi_log_word(col("log_data"), 1))
    .withColumn("gem_scaled", col("gem_amt").cast("double") / 1000000.0)
    .withColumn("dai_leg", when(col("is_buy"),
        col("gem_scaled") +
          col("gem_scaled") * (col("fee_dec").cast("double") / 10000.0))
      .otherwise(col("gem_scaled") -
        col("gem_scaled") * (col("fee_dec").cast("double") / 10000.0)))

  /** The exchange_underlying decode core on any frame with (log_data,
    * calldata, caller_pool): coin ids and amounts from the
    * TokenExchangeUnderlying LOG, calldata echo for the cross-check; the
    * POOL is the frame's CALLER (v1_meta.rs `pool: info.from_address` —
    * the metapool impl is delegatecalled). */
  private[graft] def underlyingDecode(t: org.apache.spark.sql.DataFrame) = t
    .withColumn("sid", abi_log_word(col("log_data"), 0))
    .withColumn("amt_in", abi_log_word(col("log_data"), 1))
    .withColumn("bid", abi_log_word(col("log_data"), 2))
    .withColumn("amt_out", abi_log_word(col("log_data"), 3))
    .withColumn("cd_i", abi_word(col("calldata"), 0))
    .withColumn("cd_dx", abi_word(col("calldata"), 2))

  /** C1 (Maker PSM): buyGem on direction-0 frames, sellGem on direction-1.
    * The usr ADDRESS word round-trips through [[AbiAddress]] (fixture md5
    * addresses are 16 bytes → the packed 20-byte address is 4 zero bytes ‖
    * md5); the fee (basis-point integer, DAI side) rides the log's word1
    * next to the echoed gem amount. The gem is the pool's token1, DAI its
    * token0 (psm.rs:29-34); gem token ids 40/41 cross the C9 missing-token
    * path through a real address-word decode. */
  private val c1PsmSwap = QueryDef(
    "c1_psm_swap",
    (s, dir) => {
      val t = tracesTable(s, dir)
        .filter(col("selector") === SelV2Swap)
        .withColumn("q6l", col("q6").cast("long"))
        .withColumn("p2l", col("p2").cast("long"))
        .withColumn("is_buy", col("direction") === 0)
        .withColumn("fee_bps", col("p2l") % 100)
        // address word: 12 zero bytes ‖ (4 zero bytes ‖ 16 md5 bytes)
        .withColumn("calldata", unhex(concat(col("selector"),
          lit("0" * 32), col("from_address"), word(col("q6l")))))
        .withColumn("log_data",
          unhex(concat(word(col("q6l")), word(col("fee_bps")))))
      val dec = psmDecode(t)
      val p = pools(s).select(col("address").as("p_addr"),
        col("t0_id").as("dai_id"), col("t1_id").as("gem_id"))
      val tk = tokens(s).select(col("token_id").as("tk_id"), col("decimals"))
      dec.join(broadcast(p), col("to_address") === col("p_addr"))
        .join(broadcast(tk), col("gem_id") === col("tk_id"), "left")
        .groupBy(when(col("is_buy"), "buy_gem").otherwise("sell_gem")
          .as("action"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("usr") === concat(lit("0" * 8), col("from_address")),
            1L).otherwise(0L)).as("n_usr_ok"),
          sum(when(col("gem_amt") === col("q6l") &&
            col("fee_dec") === col("fee_bps"), 1L).otherwise(0L))
            .as("n_roundtrip_ok"),
          dsum(col("gem_scaled")).as("sum_gem"),
          dsum(col("dai_leg")).as("sum_dai"),
          countDistinct(col("dai_id")).as("n_dai_ids"),
          sum(when(col("decimals").isNull, 1L).otherwise(0L))
            .as("n_missing_gem_dec"))
        .orderBy("action")
    },
    withCtes(s"""SELECT
        CASE WHEN t.direction = 0 THEN 'buy_gem' ELSE 'sell_gem' END AS action,
        COUNT(*) AS n,
        COUNT(*) AS n_usr_ok,
        COUNT(*) AS n_roundtrip_ok,
        ${sqlSum("t.q6 / 1000000.0e0")} AS sum_gem,
        ${sqlSum("""CASE WHEN t.direction = 0
            THEN t.q6 / 1000000.0e0
               + (t.q6 / 1000000.0e0) * ((CAST(t.p2 AS BIGINT) % 100) / 10000.0e0)
            ELSE t.q6 / 1000000.0e0
               - (t.q6 / 1000000.0e0) * ((CAST(t.p2 AS BIGINT) % 100) / 10000.0e0)
          END""")} AS sum_dai,
        CAST(COUNT(DISTINCT p.t0_id) AS BIGINT) AS n_dai_ids,
        CAST(SUM(CASE WHEN tk.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_missing_gem_dec
      FROM trace t
      JOIN pool p ON t.to_address = p.address
      LEFT JOIN tok tk ON p.t1_id = tk.token_id
      WHERE t.selector = '$SelV2Swap'
      GROUP BY 1 ORDER BY 1"""))

  /** C1 (Curve exchange_underlying): the impl frame is synthesized as the
    * DELEGATECALL the reference sees — the metapool (the trace's target)
    * becomes the impl call's FROM, and the pool identity is that caller
    * (v1_meta.rs `pool: info.from_address`). Coin ids and amounts decode
    * from the TokenExchangeUnderlying LOG; the calldata's (i, j, dx) are
    * cross-checked against the log's (sold_id, bought_id, tokens_sold). */
  private val c1CurveUnderlying = QueryDef(
    "c1_curve_underlying",
    (s, dir) => {
      val cp = pools(s).filter(col("protocol") === "curve")
        .withColumn("n_coins", lit(2L) + col("pool_id") % 3)
        .select(col("address").as("cp_addr"), col("n_coins"))
      val t = tracesTable(s, dir)
        .filter(col("selector") === SelCurveSwap)
        .withColumn("q6l", col("q6").cast("long"))
        .withColumn("p2l", col("p2").cast("long"))
        .join(broadcast(cp), col("to_address") === col("cp_addr"))
        // the impl frame: caller = the metapool (delegatecall shape)
        .withColumn("caller_pool", col("to_address"))
        .withColumn("i", col("q6l") % col("n_coins"))
        .withColumn("j",
          (col("i") + 1 + col("p2l") % (col("n_coins") - 1)) % col("n_coins"))
        .withColumn("calldata", unhex(concat(col("selector"),
          word(col("i")), word(col("j")), word(col("q6l")), word(col("p2l")))))
        .withColumn("log_data", unhex(concat(
          word(col("i")), word(col("q6l")), word(col("j")), word(col("p2l")))))
      val dec = underlyingDecode(t)
      val pcIn = IndirectOps.poolCoins(s).select(col("address").as("in_addr"),
        col("coin_idx").as("in_idx"), col("coin_token_id").as("token_in_id"))
      val pcOut = IndirectOps.poolCoins(s).select(col("address").as("out_addr"),
        col("coin_idx").as("out_idx"), col("coin_token_id").as("token_out_id"))
      dec
        .join(broadcast(pcIn), col("caller_pool") === col("in_addr") &&
          col("sid") === col("in_idx"))
        .join(broadcast(pcOut), col("caller_pool") === col("out_addr") &&
          col("bid") === col("out_idx"))
        .groupBy(col("token_in_id"))
        .agg(count(lit(1)).as("n"),
          dsum(col("amt_in").cast("double") / 1000000.0).as("sum_sold"),
          dsum(col("amt_out").cast("double") / 1000000.0).as("sum_bought"),
          countDistinct(col("token_out_id")).as("n_out_tokens"),
          // the reference trusts the LOG; the calldata echo must agree
          sum(when(col("cd_i") === col("sid") && col("cd_dx") === col("amt_in"),
            1L).otherwise(0L)).as("n_log_matches_calldata"))
        .orderBy("token_in_id")
    },
    withCtes(s""", pcu AS (
        SELECT p.address, k AS coin_idx,
          (p.pool_id % $NumTokens + k) % $TokRefSpace AS coin_token_id
        FROM pool p CROSS JOIN range(4) t(k)
        WHERE p.protocol = 'curve' AND k < 2 + p.pool_id % 3),
      cuw AS (
        SELECT t.*, CAST(t.q6 AS BIGINT) AS q6l, CAST(t.p2 AS BIGINT) AS p2l,
          2 + p.pool_id % 3 AS n_coins
        FROM trace t JOIN pool p
          ON t.to_address = p.address AND p.protocol = 'curve'
        WHERE t.selector = '$SelCurveSwap'),
      cuij AS (
        SELECT *, q6l % n_coins AS i,
          (q6l % n_coins + 1 + p2l % (n_coins - 1)) % n_coins AS j
        FROM cuw)
      SELECT ci.coin_token_id AS token_in_id, COUNT(*) AS n,
        ${sqlSum("q6 / 1000000.0e0")} AS sum_sold,
        ${sqlSum("p2 / 1000000.0e0")} AS sum_bought,
        CAST(COUNT(DISTINCT cj.coin_token_id) AS BIGINT) AS n_out_tokens,
        COUNT(*) AS n_log_matches_calldata
      FROM cuij c
      JOIN pcu ci ON c.to_address = ci.address AND c.i = ci.coin_idx
      JOIN pcu cj ON c.to_address = cj.address AND c.j = cj.coin_idx
      GROUP BY 1 ORDER BY 1"""))
}
