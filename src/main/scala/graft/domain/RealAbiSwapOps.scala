package graft.domain

import graft.QueryDef
import graft.functions.AbiCalldata.{abi_log_address, abi_log_word}
import graft.ops.ExactAgg.{dsum, sqlSum}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL public ABI layouts, round-13 tail: the swap-family shapes still
  * unexercised by real bytes after the r12/r13 ports.
  *
  *   - ClipperExchange (classifiers/clipper/clipper_exchange.rs:8-160):
  *     FIVE selectors — `swap`, `sellEthForToken`, `sellTokenForEth`,
  *     `transmitAndSwap`, `transmitAndSellTokenForEth` — that all fan
  *     into ONE decode arm reading ONLY the `Swapped` event; the decode
  *     never touches calldata. And uniquely among the ported layouts,
  *     the identifying fields are INDEXED event parameters: `inAsset` /
  *     `outAsset` / `recipient` ride the log's TOPICS (three bare
  *     32-byte words), while only `inAmount` / `outAmount` /
  *     `auxiliaryData` sit in the data section
  *     (classifier-abis/ClipperExchange.json `Swapped`). The repo
  *     models topics as their own bytes column — the same bare-word
  *     geometry as log data, so the codegen'd log decoders apply
  *     unchanged; nothing about topic words needs a new expression.
  *
  * Reference semantics pinned per arm:
  *   - `logs.swapped_field?` fails FIRST — a frame with no Swapped
  *     event quarantines before any token fetch (n_no_log; those
  *     frames never count token-missing);
  *   - `try_fetch_token_info(logs.inAsset)?` / `(logs.outAsset)?` —
  *     EITHER missing token quarantines the frame (n_quarantined);
  *   - `recipient = logs.recipient` — the RECIPIENT comes from the
  *     log topic, not msg_sender (clipper_exchange.rs:18-20), unlike
  *     every other ported swap;
  *   - `pool = info.target_address`, amounts scale by each token's
  *     own decimals.
  */
object RealAbiSwapOps extends graft.QueryModule {

  import ChainFixture._
  import RealAbiOps.{pow10d, sqlPow10, word}

  def defs: Seq[QueryDef] = Seq(c1ClipperSwap)

  private def withCtes(sql: String) = Some(s"WITH ${ChainFixture.sqlCtes} $sql")

  /** The five Clipper method names, indexed by the fixture arm. The
    * selectors are fixture-derived (md5 prefixes — no keccak
    * in-container); what the reference's selector table buys is ONE
    * shared decode body behind five entries, and that fan-in is what
    * the arm dimension exercises. */
  private[domain] val ClipperMethods: Seq[String] = Seq(
    "swap", "sell_eth_for_token", "sell_token_for_eth",
    "transmit_and_swap", "transmit_and_sell_token_for_eth")

  /** The Clipper decode core on any frame with (log_topics, log_data):
    * everything from the Swapped EVENT — assets + recipient from the
    * three topic words (indexed params), amounts from data words 0/1,
    * and the auxiliaryData head offset at data word 2 (= 96 on a
    * well-formed 3-static-word data section, validating the bytes tail
    * is where ABI puts it). */
  private[graft] def clipperDecode(t: DataFrame): DataFrame = t
    .withColumn("in_asset", abi_log_address(col("log_topics"), 0))
    .withColumn("out_asset", abi_log_address(col("log_topics"), 1))
    .withColumn("recip_dec", abi_log_address(col("log_topics"), 2))
    .withColumn("amt_in", abi_log_word(col("log_data"), 0))
    .withColumn("amt_out", abi_log_word(col("log_data"), 1))
    .withColumn("aux_off", abi_log_word(col("log_data"), 2))

  /** C1 (ClipperExchange, all five selectors → Swap): the log-only,
    * topics-sourced swap. Fixture: every SelV3Swap frame becomes one
    * Clipper frame; arm = (q6+p2) % 5 picks the method; p2 % 6 == 0
    * models the absent-event arm; the out-asset steps +3 through the
    * token ref space so BOTH fetch arms cross the missing-token ids
    * (in: 40/41, out: 37/38 → ids 40/41 after the step).
    *
    * Scale shape: one pruned trace scan, two broadcast token joins,
    * one 5-group rollup — no fact shuffle before the agg; every decode
    * is a codegen'd bare-word read. */
  private val c1ClipperSwap = QueryDef(
    "c1_clipper_swap",
    (s, dir) => {
      val t = tracesTable(s, dir)
        .filter(col("selector") === SelV3Swap)
        .withColumn("q6l", col("q6").cast("long"))
        .withColumn("p2l", col("p2").cast("long"))
        .withColumn("arm", ((col("q6l") + col("p2l")) % 5).cast("int"))
        .withColumn("method",
          element_at(array(ClipperMethods.map(lit): _*), col("arm") + 1))
        .withColumn("has_log", col("p2l") % 6 =!= 0)
        .withColumn("out_tid", (col("tok_id") + 3) % TokRefSpace)
      val packed = t
        .withColumn("log_topics", when(col("has_log"), unhex(concat(
            lit("0" * 32), md5(concat(lit("tok:"), col("tok_id"))),
            lit("0" * 32), md5(concat(lit("tok:"), col("out_tid"))),
            lit("0" * 32), col("from_address"))))
          .otherwise(unhex(lit(""))))
        .withColumn("log_data", when(col("has_log"), unhex(concat(
            word(col("q6l")), word(col("p2l")),
            word(lit(96L)), word(lit(0L)))))
          .otherwise(unhex(lit(""))))
      val tkIn = tokens(s).select(col("address").as("in_a"),
        col("decimals").as("in_dec"))
      val tkOut = tokens(s).select(col("address").as("out_a"),
        col("decimals").as("out_dec"))
      clipperDecode(packed)
        .join(broadcast(tkIn),
          col("in_asset") === concat(lit("0" * 8), col("in_a")), "left")
        .join(broadcast(tkOut),
          col("out_asset") === concat(lit("0" * 8), col("out_a")), "left")
        .withColumn("status",
          when(col("in_asset").isNull, "no_log") // swapped_field? FIRST
            .when(col("in_dec").isNull || col("out_dec").isNull,
              "quarantined")
            .otherwise("ok"))
        .groupBy("method")
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("status") === "no_log", 1L).otherwise(0L))
            .as("n_no_log"),
          sum(when(col("status") === "quarantined", 1L).otherwise(0L))
            .as("n_quarantined"),
          sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_ok"),
          sum(when(col("recip_dec") ===
            concat(lit("0" * 8), col("from_address")), 1L).otherwise(0L))
            .as("n_recip_ok"),
          sum(when(col("status") =!= "no_log" && col("aux_off") === 96L, 1L)
            .otherwise(0L)).as("n_aux_ok"),
          dsum(when(col("status") === "ok",
            col("amt_in").cast("double") / pow10d(col("in_dec")))
            .otherwise(lit(0.0))).as("sum_in_scaled"),
          dsum(when(col("status") === "ok",
            col("amt_out").cast("double") / pow10d(col("out_dec")))
            .otherwise(lit(0.0))).as("sum_out_scaled"))
        .orderBy("method")
    },
    withCtes(s""", clf AS (
        SELECT CAST(t.q6 AS BIGINT) AS q6l, CAST(t.p2 AS BIGINT) AS p2l,
          (CAST(t.q6 AS BIGINT) + CAST(t.p2 AS BIGINT)) % 5 AS arm,
          CAST(t.p2 AS BIGINT) % 6 <> 0 AS has_log,
          t.tok_id AS in_tid, (t.tok_id + 3) % $TokRefSpace AS out_tid
        FROM trace t WHERE t.selector = '$SelV3Swap'),
      cls AS (
        SELECT f.*,
          ['swap', 'sell_eth_for_token', 'sell_token_for_eth',
           'transmit_and_swap', 'transmit_and_sell_token_for_eth'][arm + 1]
            AS method,
          i.decimals AS in_dec, o.decimals AS out_dec,
          CASE WHEN NOT f.has_log THEN 'no_log'
            WHEN i.decimals IS NULL OR o.decimals IS NULL THEN 'quarantined'
            ELSE 'ok' END AS status
        FROM clf f LEFT JOIN tok i ON i.token_id = f.in_tid
          LEFT JOIN tok o ON o.token_id = f.out_tid)
      SELECT method, CAST(COUNT(*) AS BIGINT) AS n_frames,
        CAST(SUM(CASE WHEN status = 'no_log' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_no_log,
        CAST(SUM(CASE WHEN status = 'quarantined' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_quarantined,
        CAST(SUM(CASE WHEN status = 'ok' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_ok,
        CAST(SUM(CASE WHEN has_log THEN 1 ELSE 0 END) AS BIGINT)
          AS n_recip_ok,
        CAST(SUM(CASE WHEN has_log THEN 1 ELSE 0 END) AS BIGINT)
          AS n_aux_ok,
        ${sqlSum(s"""CASE WHEN status = 'ok'
          THEN q6l / ${sqlPow10.format("in_dec")} ELSE 0.0e0 END""")}
          AS sum_in_scaled,
        ${sqlSum(s"""CASE WHEN status = 'ok'
          THEN p2l / ${sqlPow10.format("out_dec")} ELSE 0.0e0 END""")}
          AS sum_out_scaled
      FROM cls GROUP BY 1 ORDER BY 1"""))
}
