package graft.domain

import graft.{QueryDef, QueryModule}
import graft.ops.ExactAgg._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classification layer (SURVEY §2.3, C1–C9): the decode/normalize stage
  * that turns raw call traces into the canonical `actions` table every
  * inspector consumes.
  *
  * Reference shape being matched (all under /root/reference/crates/):
  *   C1 `action_impl!` decoders        brontes-macros/src/lib.rs:95
  *   C2 `action_dispatch!` router      brontes-macros/src/lib.rs:137
  *   C3 `discovery_impl!` discovery    brontes-classifier/src/classifiers/curve/discovery.rs
  *   C4 ERC-20 fallback decode         brontes-classifier/src/classifiers/erc20.rs
  *   C5 multi-frame classification     brontes-classifier/src/multi_frame_classification/
  *   C6 tax-token fixup                brontes-classifier/src/tree_builder/tree_pruning.rs:13
  *   C7 duplicate-transfer prune       tree_pruning.rs:123
  *   C8 coinbase-transfer extraction   tree_builder/utils.rs
  *   C9 missing-token backfill         brontes-core/src/missing_token_info.rs
  *
  * Spark shape: the trace fact joins ONLY broadcast dimensions (pools,
  * registry, tokens) and the decode itself is a codegen'd `when()` cascade —
  * at 100 TB the fact streams through map-side joins without a shuffle
  * until each query's final rollup.
  */
object ClassifyOps extends QueryModule {

  import ChainFixture._

  private def acts(s: SparkSession, dir: String): DataFrame = actionsTable(s, dir)

  private def withCtes(sql: String) = Some(s"WITH $sqlCtes $sql")

  def defs: Seq[QueryDef] = Seq(c1DecodeSwap, c2Dispatch, c3Discovery,
    c4TransferDecode, c5MultiframePair, c6TaxFixup, c7DupTransferPrune,
    c8Coinbase, c9MissingToken)

  /** C1: per-protocol decoded swap amounts — broadcast-join decode with
    * decimal scaling; NULL amounts mark the missing-token path. */
  private val c1DecodeSwap = QueryDef(
    "c1_decode_swap",
    (s, dir) => acts(s, dir)
      .filter(col("action_type") === "swap")
      .groupBy("protocol")
      .agg(count(lit(1)).as("n_swaps"),
        dsum(col("amount_in")).as("sum_in"),
        dsum(col("amount_out")).as("sum_out"),
        sum(when(col("amount_in").isNull || col("amount_out").isNull, 1L)
          .otherwise(0L)).as("n_undecoded"))
      .orderBy("protocol"),
    withCtes(s"""SELECT protocol, COUNT(*) AS n_swaps,
      ${sqlSum("amount_in")} AS sum_in, ${sqlSum("amount_out")} AS sum_out,
      CAST(SUM(CASE WHEN amount_in IS NULL OR amount_out IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_undecoded
      FROM actions WHERE action_type = 'swap' GROUP BY 1 ORDER BY 1"""))

  /** C2: dispatch router coverage — every trace lands in exactly one
    * action_type (incl. the unmatched → 'unclassified' path). */
  private val c2Dispatch = QueryDef(
    "c2_dispatch",
    (s, dir) => acts(s, dir)
      .groupBy("action_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("tx_hash")).as("n_txs"),
        countDistinct(col("protocol")).as("n_protocols"))
      .orderBy("action_type"),
    withCtes("""SELECT action_type, COUNT(*) AS n,
      CAST(COUNT(DISTINCT tx_hash) AS BIGINT) AS n_txs,
      CAST(COUNT(DISTINCT protocol) AS BIGINT) AS n_protocols
      FROM actions GROUP BY 1 ORDER BY 1"""))

  /** C3: factory discovery — first block each pool is observed in, rolled
    * up per protocol (the `NormalizedNewPool` upsert analog). */
  private val c3Discovery = QueryDef(
    "c3_discovery",
    (s, dir) => acts(s, dir)
      .filter(col("pool").isNotNull)
      .groupBy("pool", "protocol")
      .agg(min(col("block_number")).as("first_block"))
      .groupBy("protocol")
      .agg(count(lit(1)).as("n_pools"),
        min(col("first_block")).as("earliest"),
        max(col("first_block")).as("latest"),
        sum(col("first_block")).as("sum_first_blocks"))
      .orderBy("protocol"),
    withCtes("""SELECT protocol, COUNT(*) AS n_pools,
      MIN(first_block) AS earliest, MAX(first_block) AS latest,
      CAST(SUM(first_block) AS BIGINT) AS sum_first_blocks
      FROM (SELECT pool, protocol, MIN(block_number) AS first_block
            FROM actions WHERE pool IS NOT NULL GROUP BY 1, 2)
      GROUP BY 1 ORDER BY 1"""))

  /** C4: ERC-20 transfer fallback decode with fee-on-transfer (tax token)
    * detection — the classifier path taken when the registry misses. */
  private val c4TransferDecode = QueryDef(
    "c4_transfer_decode",
    (s, dir) => acts(s, dir)
      .filter(col("action_type") === "transfer")
      .withColumn("is_tax", col("token_in_id") % 10 === 0)
      .groupBy("is_tax")
      .agg(count(lit(1)).as("n"),
        dsum(col("amount_in")).as("sum_amount"),
        dsum(col("fee")).as("sum_fee"),
        sum(when(col("amount_in").isNull, 1L).otherwise(0L)).as("n_missing_token"))
      .orderBy("is_tax"),
    withCtes(s"""SELECT (token_in_id % 10 = 0) AS is_tax, COUNT(*) AS n,
      ${sqlSum("amount_in")} AS sum_amount, ${sqlSum("fee")} AS sum_fee,
      CAST(SUM(CASE WHEN amount_in IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_token
      FROM actions WHERE action_type = 'transfer' GROUP BY 1 ORDER BY 1"""))

  /** C5: multi-frame classification — flash-loan BORROW↔REPAY leg matching
    * within call-frame span ranges (multi_frame_classification/, the
    * reference walks a frame range and pairs the loan's outbound leg with
    * the covering repayment). Here: transfers split by direction (0 =
    * funds arrive / borrow leg, 1 = funds return / repay leg), rank-paired
    * per (tx, token, depth-1 span head) in frame order, and a pair counts
    * as REPAID only when the repay frame comes after the borrow frame AND
    * its amount covers the loan — the reference's amount-coverage check.
    * Two rank windows + one equi-join on (tx, token, span, rank); no
    * cross-tx state. */
  private val c5MultiframePair = QueryDef(
    "c5_multiframe_pair",
    (s, dir) => {
      val tr = acts(s, dir)
        .filter(col("action_type") === "transfer" && col("amount_in").isNotNull)
        .withColumn("span_head", element_at(col("trace_address"), 1))
      val w = Window.partitionBy("tx_hash", "token_in_id", "span_head")
        .orderBy("trace_idx")
      def side(d: Int, pfx: String) = tr.filter(col("direction") === d)
        .withColumn("rk", row_number().over(w))
        .select(col("tx_hash"), col("token_in_id"), col("span_head"), col("rk"),
          col("trace_idx").as(s"${pfx}_idx"), col("amount_in").as(s"${pfx}_amt"))
      side(0, "b").join(side(1, "r"),
          Seq("tx_hash", "token_in_id", "span_head", "rk"), "full")
        .withColumn("repaid", col("r_idx") > col("b_idx") &&
          col("r_amt") >= col("b_amt"))
        .groupBy((col("token_in_id") % 5).as("token_bucket"))
        .agg(sum(when(col("b_idx").isNotNull, 1L).otherwise(0L)).as("n_borrows"),
          sum(when(col("r_idx").isNotNull, 1L).otherwise(0L)).as("n_repays"),
          sum(when(col("b_idx").isNotNull && col("r_idx").isNotNull, 1L)
            .otherwise(0L)).as("n_pairs"),
          sum(when(col("repaid"), 1L).otherwise(0L)).as("n_repaid_pairs"),
          dsumR(when(col("repaid"), col("r_amt") - col("b_amt"))).as("sum_excess"))
        .orderBy("token_bucket")
    },
    withCtes(""", tr5 AS (
        SELECT tx_hash, token_in_id, trace_address[1] AS span_head,
          direction, trace_idx, amount_in
        FROM actions
        WHERE action_type = 'transfer' AND amount_in IS NOT NULL),
      b5 AS (
        SELECT tx_hash, token_in_id, span_head,
          ROW_NUMBER() OVER (PARTITION BY tx_hash, token_in_id, span_head
                             ORDER BY trace_idx) AS rk,
          trace_idx AS b_idx, amount_in AS b_amt
        FROM tr5 WHERE direction = 0),
      r5 AS (
        SELECT tx_hash, token_in_id, span_head,
          ROW_NUMBER() OVER (PARTITION BY tx_hash, token_in_id, span_head
                             ORDER BY trace_idx) AS rk,
          trace_idx AS r_idx, amount_in AS r_amt
        FROM tr5 WHERE direction = 1),
      pairs5 AS (
        SELECT COALESCE(b.token_in_id, r.token_in_id) AS token_in_id,
          b.b_idx, b.b_amt, r.r_idx, r.r_amt,
          (r.r_idx > b.b_idx AND r.r_amt >= b.b_amt) AS repaid
        FROM b5 b FULL JOIN r5 r
          ON b.tx_hash = r.tx_hash AND b.token_in_id = r.token_in_id
         AND b.span_head = r.span_head AND b.rk = r.rk)
      SELECT token_in_id % 5 AS token_bucket,
        CAST(SUM(CASE WHEN b_idx IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_borrows,
        CAST(SUM(CASE WHEN r_idx IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_repays,
        CAST(SUM(CASE WHEN b_idx IS NOT NULL AND r_idx IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
        CAST(SUM(CASE WHEN repaid THEN 1 ELSE 0 END) AS BIGINT) AS n_repaid_pairs,
        """ + sqlSumR("CASE WHEN repaid THEN r_amt - b_amt END") + """ AS sum_excess
      FROM pairs5 GROUP BY 1 ORDER BY 1"""))

  /** C6: tax-token fixup — subtract sibling same-tx transfer fees from the
    * swap's received amount (span-join + conditional rewrite). */
  private val c6TaxFixup = QueryDef(
    "c6_tax_fixup",
    (s, dir) => {
      val a = acts(s, dir).persist()
      val fees = a.filter(col("action_type") === "transfer" && col("fee").isNotNull)
        .groupBy(col("tx_hash").as("f_tx"), col("token_in_id").as("f_tok"))
        .agg(dsum(col("fee")).as("fee_sum"))
      a.filter(col("action_type") === "swap" && col("amount_out").isNotNull)
        .join(fees, col("tx_hash") === col("f_tx") &&
          col("token_out_id") === col("f_tok"), "left")
        .withColumn("adjusted_out", col("amount_out") - coalesce(col("fee_sum"), lit(0.0)))
        .groupBy("protocol")
        .agg(count(lit(1)).as("n_swaps"),
          sum(when(col("fee_sum").isNotNull, 1L).otherwise(0L)).as("n_adjusted"),
          dsum(col("adjusted_out")).as("sum_adjusted_out"))
        .orderBy("protocol")
    },
    withCtes(s"""SELECT s.protocol, COUNT(*) AS n_swaps,
      CAST(SUM(CASE WHEN f.fee_sum IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_adjusted,
      ${sqlSum("s.amount_out - COALESCE(f.fee_sum, 0.0)")} AS sum_adjusted_out
      FROM (SELECT * FROM actions WHERE action_type = 'swap' AND amount_out IS NOT NULL) s
      LEFT JOIN (SELECT tx_hash AS f_tx, token_in_id AS f_tok,
                   ${sqlSum("fee")} AS fee_sum
                 FROM actions WHERE action_type = 'transfer' AND fee IS NOT NULL
                 GROUP BY 1, 2) f
        ON s.tx_hash = f.f_tx AND s.token_out_id = f.f_tok
      GROUP BY 1 ORDER BY 1"""))

  /** C7: duplicate-transfer prune — identical (tx, dest, token, amount)
    * rows keep only the outermost frame (lowest trace_idx). */
  private val c7DupTransferPrune = QueryDef(
    "c7_dup_transfer_prune",
    (s, dir) => {
      val w = Window
        .partitionBy(col("tx_hash"), col("to_address"), col("token_in_id"), col("amount_in"))
        .orderBy(col("trace_idx").asc)
      acts(s, dir)
        .filter(col("action_type") === "transfer" && col("amount_in").isNotNull)
        .withColumn("rn", row_number().over(w))
        .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_pruned"))
    },
    withCtes("""SELECT
      CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned
      FROM (SELECT ROW_NUMBER() OVER (
              PARTITION BY tx_hash, to_address, token_in_id, amount_in
              ORDER BY trace_idx ASC) AS rn
            FROM actions WHERE action_type = 'transfer' AND amount_in IS NOT NULL)"""))

  /** C8: coinbase-transfer extraction — frames whose destination is the
    * block's beneficiary (builder bribes). Blocks dim broadcasts. */
  private val c8Coinbase = QueryDef(
    "c8_coinbase",
    (s, dir) => {
      val t = tracesTable(s, dir)
      val b = blocks(s, dir).select(col("block_number").as("b_block"), col("beneficiary"))
      t.join(broadcast(b), t("block_number") === col("b_block"))
        .filter(col("to_address") === col("beneficiary"))
        .groupBy("beneficiary")
        .agg(count(lit(1)).as("n_bribes"),
          countDistinct(col("tx_hash")).as("n_txs"),
          sum(col("priority_fee")).as("sum_priority"))
        .orderBy("beneficiary")
    },
    withCtes("""SELECT b.beneficiary, COUNT(*) AS n_bribes,
      CAST(COUNT(DISTINCT t.tx_hash) AS BIGINT) AS n_txs,
      CAST(SUM(t.priority_fee) AS BIGINT) AS sum_priority
      FROM trace t JOIN blocks b ON t.block_number = b.block_number
      WHERE t.to_address = b.beneficiary
      GROUP BY 1 ORDER BY 1"""))

  /** C9: missing-token quarantine — token ids referenced by classified
    * actions whose decimals are unknown (decode → NULL, row → quarantine). */
  private val c9MissingToken = QueryDef(
    "c9_missing_token",
    (s, dir) => {
      val a = acts(s, dir).persist()
      val ins = a.filter(col("token_in_id").isNotNull && col("dec_in").isNull)
        .select(col("token_in_id").as("token_id"), col("action_type"))
      val outs = a.filter(col("token_out_id").isNotNull && col("dec_out").isNull)
        .select(col("token_out_id").as("token_id"), col("action_type"))
      ins.unionByName(outs)
        .groupBy("token_id")
        .agg(count(lit(1)).as("n_refs"),
          countDistinct(col("action_type")).as("n_action_types"))
        .orderBy("token_id")
    },
    withCtes("""SELECT token_id, COUNT(*) AS n_refs,
      CAST(COUNT(DISTINCT action_type) AS BIGINT) AS n_action_types
      FROM (SELECT token_in_id AS token_id, action_type FROM actions
            WHERE token_in_id IS NOT NULL AND dec_in IS NULL
            UNION ALL
            SELECT token_out_id AS token_id, action_type FROM actions
            WHERE token_out_id IS NOT NULL AND dec_out IS NULL)
      GROUP BY 1 ORDER BY 1"""))
}
