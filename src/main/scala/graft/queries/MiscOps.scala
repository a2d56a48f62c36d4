package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.domain.{Accounting, ChainFixture}
import graft.ops.ExactAgg._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining small inventory rows (SURVEY §2.2 P4/P5/P9–P11/P13/P14,
  * §2.7 T1/T3/T4, §2.8 F2/F4/F6–F8/F10, §2.1 S4) — each a one-pattern
  * query over the generic tables or the chain fixture.
  */
object MiscOps extends QueryModule {

  private def withDomain(sql: String) = Some(s"WITH ${Accounting.sqlDomainCtes} $sql")
  /** Like [[withDomain]] but RECURSIVE — for oracles splicing in the
    * TickSql integer-chain CTEs. */
  private def withDomainRec(sql: String) =
    Some(s"WITH RECURSIVE ${Accounting.sqlDomainCtes} $sql")

  def defs: Seq[QueryDef] = Seq(p4ModifySpans, p5MapFilter, p9CollectVec,
    p10ZipPadded, p11MergeIter, p13FrontendPrunes, p14RemoveDup,
    p18RevertSubtree,
    t1SortDedup, t3BundleOrdering, t4SetSemiDiff,
    f2SwapRate, f4StableClass, f6HexFormat, f7GasMath, f8MaxArbDelta,
    f10PoolMath, f10TickMath, f10TickCross, s4PartitionedSink)

  /** P18 revert-subtree pruning (tree_builder/mod.rs:330-332: an errored
    * trace classifies to `Action::Revert` and contributes nothing; in EVM
    * semantics the error propagates to the whole call SUBTREE — the
    * reference's reverting-contract test family, atomic_arb.rs
    * `test_reverting_contract`/`test_more_reverting`). Reverted frames
    * are a deterministic md5 draw (~1/16, the fixture's mempool-label
    * pattern); a trace drops when ANY reverted frame in its tx is a
    * trace_address PREFIX of it (self included) — the P3 span machinery
    * run as an existence test. Per-tx frame counts are tiny (≤7), so the
    * prefix join is equi-keyed on tx_hash with a bounded residual. */
  /** The subtree-drop rule alone, DataFrame-parameterized for the golden
    * battery: a trace drops when any reverted frame (`r_tx`, `r_addr`) in
    * its tx is a trace_address prefix of it — self included, siblings
    * untouched. */
  private[graft] def revertDroppedOf(t: org.apache.spark.sql.DataFrame,
      rev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    t.join(rev,
      col("tx_hash") === col("r_tx") &&
        slice(col("trace_address"), lit(1), size(col("r_addr"))) === col("r_addr"),
      "left_semi")

  private val p18RevertSubtree = QueryDef(
    "p18_revert_subtree",
    (s, dir) => {
      val t = ChainFixture.tracesTable(s, dir)
        .select(col("block_number"), col("tx_hash"), col("trace_idx"),
          col("trace_address"), col("q6").cast("long").as("q6l"))
      val rev = t.filter(substring(md5(concat(lit("rev:"), col("tx_hash"),
          lit(":"), col("trace_idx"))), 1, 1) === "0")
        .select(col("block_number").as("r_block"), col("tx_hash").as("r_tx"),
          col("trace_address").as("r_addr"))
      val dropped = revertDroppedOf(t, rev)
        .select(col("block_number"), col("tx_hash"), col("trace_idx"))
        .withColumn("dropped", lit(1L))
      val revBlk = rev.groupBy(col("r_block").as("block_number"))
        .agg(count(lit(1)).as("n_revert_frames"))
      t.join(dropped, Seq("block_number", "tx_hash", "trace_idx"), "left")
        .groupBy("block_number")
        .agg(count(lit(1)).as("n_traces"),
          sum(coalesce(col("dropped"), lit(0L))).as("n_dropped"),
          sum(when(col("dropped").isNull, 1L).otherwise(0L)).as("n_survivors"),
          sum(when(col("dropped").isNull, col("q6l")).otherwise(0L))
            .as("sum_q6_survivors"))
        .join(revBlk, Seq("block_number"), "left")
        .withColumn("n_revert_frames", coalesce(col("n_revert_frames"), lit(0L)))
        .orderBy("block_number")
    },
    withDomain(s""", rev AS (
        SELECT block_number, tx_hash, trace_address FROM trace
        WHERE substring(md5('rev:' || tx_hash || ':' || trace_idx), 1, 1) = '0'),
      drp AS (
        SELECT DISTINCT t.block_number, t.tx_hash, t.trace_idx
        FROM trace t
        WHERE EXISTS (SELECT 1 FROM rev r WHERE r.tx_hash = t.tx_hash
          AND t.trace_address[1:len(r.trace_address)] = r.trace_address)),
      revblk AS (SELECT block_number, COUNT(*) AS n_revert_frames
                 FROM rev GROUP BY 1)
      SELECT t.block_number, COUNT(*) AS n_traces,
        CAST(SUM(CASE WHEN d.trace_idx IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dropped,
        CAST(SUM(CASE WHEN d.trace_idx IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_survivors,
        CAST(SUM(CASE WHEN d.trace_idx IS NULL THEN CAST(q6 AS BIGINT)
          ELSE 0 END) AS BIGINT) AS sum_q6_survivors,
        COALESCE(MAX(r.n_revert_frames), 0) AS n_revert_frames
      FROM trace t
      LEFT JOIN drp d ON t.block_number = d.block_number
        AND t.tx_hash = d.tx_hash AND t.trace_idx = d.trace_idx
      LEFT JOIN revblk r ON t.block_number = r.block_number
      GROUP BY 1 ORDER BY 1"""))

  /** P4 modify_spans (tree/mod.rs:204): conditional in-place rewrite of
    * rows inside matched spans — rewrite becomes re-projection. */
  private val p4ModifySpans = QueryDef(
    "p4_modify_spans",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val roots = l.filter(col("l_linenumber") === 1 && col("l_returnflag") === "R")
        .select(col("l_orderkey").as("root_key")).distinct()
      l.join(roots, l("l_orderkey") === col("root_key"), "left")
        .withColumn("adj_qty",
          when(col("root_key").isNotNull, col("l_quantity") * 0.9)
            .otherwise(col("l_quantity")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(col("adj_qty")).as("sum_adj_qty"),
          sum(when(col("root_key").isNotNull, 1L).otherwise(0L)).as("n_modified"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n,
      ${sqlSum("CASE WHEN r.root_key IS NOT NULL THEN l_quantity * 0.9 ELSE l_quantity END")} AS sum_adj_qty,
      CAST(SUM(CASE WHEN r.root_key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_modified
      FROM lineitem l LEFT JOIN (
        SELECT DISTINCT l_orderkey AS root_key FROM lineitem
        WHERE l_linenumber = 1 AND l_returnflag = 'R') r
        ON l.l_orderkey = r.root_key
      GROUP BY 1 ORDER BY 1"""))

  /** P5 t_map / t_filter / t_filter_map (tree/util/base.rs): map → filter →
    * map chain, fused by Catalyst into one codegen stage. */
  private val p5MapFilter = QueryDef(
    "p5_map_filter",
    (s, dir) => Tables.events(s, dir)
      .withColumn("v2", col("value") * 2.0)
      .filter(col("v2") > 50.0)
      .withColumn("bucket", expr("CAST(FLOOR(v2 / 100) AS BIGINT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), dsum(col("v2")).as("sum_v2"))
      .orderBy("bucket"),
    Some(s"""SELECT CAST(FLOOR(value * 2.0 / 100) AS BIGINT) AS bucket,
      COUNT(*) AS n, ${sqlSum("value * 2.0")} AS sum_v2
      FROM events WHERE value * 2.0 > 50.0 GROUP BY 1 ORDER BY 1"""))

  /** P9 collect_action_vec (action_iter.rs:68): filter one variant, extract
    * its payload vector per key. */
  private val p9CollectVec = QueryDef(
    "p9_collect_vec",
    (s, dir) => Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"), dsum(col("value")).as("sum_value"),
        min(col("event_id")).as("first_id"))
      .orderBy("user_id"),
    Some(s"""SELECT user_id, COUNT(*) AS n_purchases,
      ${sqlSum("value")} AS sum_value, MIN(event_id) AS first_id
      FROM events WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1"""))

  /** P10 zip_with / ZipPadded (tree/util/zip.rs): positional zip of two
    * sequences padding the shorter with nulls — Spark side genuinely zips;
    * the oracle checks via the arithmetic equivalent. */
  private val p10ZipPadded = QueryDef(
    "p10_zip_padded",
    (s, dir) => Tables.part(s, dir)
      .withColumn("pairs", expr(
        """zip_with(split(p_name, ' '), split(p_type, ' '),
             (a, b) -> struct(a AS l, b AS r))"""))
      .withColumn("n_pairs", size(col("pairs")).cast("long"))
      .withColumn("n_padded", expr(
        "size(filter(pairs, p -> p.l IS NULL OR p.r IS NULL))").cast("long"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum(col("n_pairs")).as("sum_pairs"),
        sum(col("n_padded")).as("sum_padded"))
      .orderBy("p_brand"),
    Some("""SELECT p_brand, COUNT(*) AS n,
      CAST(SUM(GREATEST(len(string_split(p_name,' ')), len(string_split(p_type,' ')))) AS BIGINT) AS sum_pairs,
      CAST(SUM(GREATEST(len(string_split(p_name,' ')), len(string_split(p_type,' ')))
             - LEAST(len(string_split(p_name,' ')), len(string_split(p_type,' ')))) AS BIGINT) AS sum_padded
      FROM part GROUP BY 1 ORDER BY 1"""))

  /** P11 merge_iter (tree/util/merge.rs): merge tuple-of-options into one
    * stream — coalesce with source attribution. */
  private val p11MergeIter = QueryDef(
    "p11_merge_iter",
    (s, dir) => Tables.events(s, dir)
      .withColumn("a", when(col("event_type") === "purchase", col("value")))
      .withColumn("b", when(col("event_type") === "click", col("value")))
      .withColumn("merged", coalesce(col("a"), col("b")))
      .withColumn("src", when(col("a").isNotNull, "a")
        .when(col("b").isNotNull, "b").otherwise("none"))
      .groupBy("src")
      .agg(count(lit(1)).as("n"), dsum(col("merged")).as("sum_merged"))
      .orderBy("src"),
    Some(s"""SELECT CASE WHEN event_type = 'purchase' THEN 'a'
          WHEN event_type = 'click' THEN 'b' ELSE 'none' END AS src,
      COUNT(*) AS n,
      ${sqlSum("CASE WHEN event_type IN ('purchase','click') THEN value END")} AS sum_merged
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** P13 frontend prunes (frontend_prunes.rs): transfers that duplicate a
    * swap leg in the same tx are deleted before persisting. */
  private val p13FrontendPrunes = QueryDef(
    "p13_frontend_prunes",
    (s, dir) => {
      // no persist: two pruned scans of the compact store beat one
      // full-width cache materialization (q5_jit A/B: 4.1->2.0s)
      val a = ChainFixture.actionsTable(s, dir)
      val legs = a.filter(col("action_type") === "swap" && col("amount_in").isNotNull)
        .select(col("tx_hash").as("s_tx"), col("token_in_id").as("s_tok"),
          col("amount_in").as("s_amt")).distinct()
      val transfers = a.filter(col("action_type") === "transfer" && col("amount_in").isNotNull)
      transfers.join(legs, col("tx_hash") === col("s_tx") &&
          col("token_in_id") === col("s_tok") && col("amount_in") === col("s_amt"),
          "left_anti")
        .agg(count(lit(1)).as("n_kept"))
        .crossJoin(transfers.agg(count(lit(1)).as("n_total")))
        .select(col("n_kept"), col("n_total"), (col("n_total") - col("n_kept")).as("n_pruned"))
    },
    withDomain("""SELECT
        (SELECT COUNT(*) FROM actions t
         WHERE action_type = 'transfer' AND amount_in IS NOT NULL
           AND NOT EXISTS (SELECT 1 FROM actions s
             WHERE s.action_type = 'swap' AND s.amount_in IS NOT NULL
               AND s.tx_hash = t.tx_hash AND s.token_in_id = t.token_in_id
               AND s.amount_in = t.amount_in)) AS n_kept,
        (SELECT COUNT(*) FROM actions
         WHERE action_type = 'transfer' AND amount_in IS NOT NULL) AS n_total,
        (SELECT COUNT(*) FROM actions
         WHERE action_type = 'transfer' AND amount_in IS NOT NULL)
        - (SELECT COUNT(*) FROM actions t
           WHERE action_type = 'transfer' AND amount_in IS NOT NULL
             AND NOT EXISTS (SELECT 1 FROM actions s
               WHERE s.action_type = 'swap' AND s.amount_in IS NOT NULL
                 AND s.tx_hash = t.tx_hash AND s.token_in_id = t.token_in_id
                 AND s.amount_in = t.amount_in)) AS n_pruned"""))

  /** P14 remove_duplicate_data (tree/mod.rs:307): generic duplicate removal
    * keeping the earliest occurrence. */
  private val p14RemoveDup = QueryDef(
    "p14_remove_duplicate_data",
    (s, dir) => {
      val w = Window.partitionBy("user_id", "event_type", "value")
        .orderBy(expr("ts div 1000").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .groupBy("event_type")
        .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dups"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
      CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
      FROM (SELECT event_type, ROW_NUMBER() OVER (
              PARTITION BY user_id, event_type, value
              ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
            FROM events)
      GROUP BY 1 ORDER BY 1"""))

  /** T1 sort+dedup before batch lookup (tree/mod.rs:70): keep one row per
    * key (latest), then join the dimension. */
  private val t1SortDedup = QueryDef(
    "t1_sort_dedup",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val latest = Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      latest.join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), dsum(col("o_totalprice")).as("sum_latest"))
        .orderBy("c_mktsegment")
    },
    Some(s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
      ${sqlSum("o_totalprice")} AS sum_latest
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      JOIN customer ON o_custkey = c_custkey
      WHERE rn = 1 GROUP BY 1 ORDER BY 1"""))

  /** T3 bundle ordering (composer/mod.rs:222): deterministic output order +
    * first/last extraction per group. */
  private val t3BundleOrdering = QueryDef(
    "t3_bundle_ordering",
    (s, dir) => Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        min_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey"))).as("first_key"),
        max_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey"))).as("last_key"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
      (list(o_orderkey ORDER BY o_orderdate ASC, o_orderkey ASC))[1] AS first_key,
      (list(o_orderkey ORDER BY o_orderdate DESC, o_orderkey DESC))[1] AS last_key
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** T4 set semi-diffs (sandwich FastHashSet ops): per-order distinct part
    * set minus a "hot" set via anti-join. */
  private val t4SetSemiDiff = QueryDef(
    "t4_set_semi_diff",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val hot = Tables.part(s, dir).filter(col("p_size") > 45)
        .select(col("p_partkey").as("hot_key"))
      val pairs = l.select("l_orderkey", "l_partkey").distinct()
      val after = pairs.join(hot, col("l_partkey") === col("hot_key"), "left_anti")
        .groupBy("l_orderkey").agg(count(lit(1)).as("n_after"))
      pairs.groupBy("l_orderkey").agg(count(lit(1)).as("n_parts"))
        .join(after, Seq("l_orderkey"), "left")
        .withColumn("n_after", coalesce(col("n_after"), lit(0L)))
        .agg(count(lit(1)).as("n_orders"), sum(col("n_parts")).as("sum_parts"),
          sum(col("n_after")).as("sum_after_diff"))
    },
    Some("""WITH pairs AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      hot AS (SELECT p_partkey FROM part WHERE p_size > 45)
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        COUNT(*) AS sum_parts,
        CAST(SUM(CASE WHEN l_partkey NOT IN (SELECT p_partkey FROM hot)
                 THEN 1 ELSE 0 END) AS BIGINT) AS sum_after_diff
      FROM pairs"""))

  /** F2 swap_rate (swaps.rs:70): execution rate stats per protocol. */
  private val f2SwapRate = QueryDef(
    "f2_swap_rate",
    (s, dir) => ChainFixture.actionsTable(s, dir)
      .filter(col("action_type") === "swap" &&
        col("amount_in").isNotNull && col("amount_out").isNotNull)
      .withColumn("rate", col("amount_out") / col("amount_in"))
      .groupBy("protocol")
      .agg(count(lit(1)).as("n"), dsumR(col("rate")).as("sum_rate"),
        min(col("rate")).as("min_rate"), max(col("rate")).as("max_rate"))
      .orderBy("protocol"),
    withDomain(s"""SELECT protocol, COUNT(*) AS n,
      ${sqlSumR("amount_out / amount_in")} AS sum_rate,
      MIN(amount_out / amount_in) AS min_rate,
      MAX(amount_out / amount_in) AS max_rate
      FROM actions
      WHERE action_type = 'swap' AND amount_in IS NOT NULL AND amount_out IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** F4 stable-coin classification (constants.rs get_stable_type): tokens
    * 0..4 are the stable set; swap legs classified by membership. */
  private val f4StableClass = QueryDef(
    "f4_stable_class",
    (s, dir) => ChainFixture.actionsTable(s, dir)
      .filter(col("action_type") === "swap" && col("token_in_id").isNotNull &&
        col("token_out_id").isNotNull)
      .withColumn("cls",
        when(col("token_in_id") < 5 && col("token_out_id") < 5, "stable_stable")
          .when(col("token_in_id") < 5 || col("token_out_id") < 5, "stable_volatile")
          .otherwise("volatile"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n"), countDistinct(col("pool")).as("n_pools"))
      .orderBy("cls"),
    withDomain("""SELECT CASE
        WHEN token_in_id < 5 AND token_out_id < 5 THEN 'stable_stable'
        WHEN token_in_id < 5 OR token_out_id < 5 THEN 'stable_volatile'
        ELSE 'volatile' END AS cls,
      COUNT(*) AS n, CAST(COUNT(DISTINCT pool) AS BIGINT) AS n_pools
      FROM actions
      WHERE action_type = 'swap' AND token_in_id IS NOT NULL AND token_out_id IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** F6 hex/address formatting (display/utils.rs): 0x-prefixed 40-char
    * form + explorer URL building. */
  private val f6HexFormat = QueryDef(
    "f6_hex_format",
    (s, dir) => ChainFixture.tracesTable(s, dir)
      .withColumn("addr40", concat(lit("0x"), substring(col("to_address"), 1, 40)))
      .withColumn("url", concat(lit("https://explorer.example/address/"), col("addr40")))
      .groupBy(substring(col("addr40"), 3, 1).as("first_nibble"))
      .agg(countDistinct(col("addr40")).as("n_addrs"),
        count(lit(1)).as("n_traces"),
        min(length(col("url"))).as("url_len"))
      .orderBy("first_nibble"),
    withDomain("""SELECT substring('0x' || substring(to_address, 1, 40), 3, 1) AS first_nibble,
      CAST(COUNT(DISTINCT '0x' || substring(to_address, 1, 40)) AS BIGINT) AS n_addrs,
      COUNT(*) AS n_traces,
      MIN(length('https://explorer.example/address/' || '0x' || substring(to_address, 1, 40))) AS url_len
      FROM trace GROUP BY 1 ORDER BY 1"""))

  /** F7 gas math (tree/root.rs:362): gas_paid / priority_fee_paid in ETH
    * per block. */
  private val f7GasMath = QueryDef(
    "f7_gas_math",
    (s, dir) => {
      val b = ChainFixture.blocks(s, dir)
        .select(col("block_number").as("b_block"), col("base_fee"))
      ChainFixture.tracesTable(s, dir)
        .join(broadcast(b), col("block_number") === col("b_block"))
        .groupBy(expr("block_number div 100").as("block_bucket"))
        .agg(dsum((col("gas_used") * (col("priority_fee") + col("base_fee"))).cast("double") / 1e9)
          .as("gas_eth"),
          dsum((col("gas_used") * col("priority_fee")).cast("double") / 1e9).as("tip_eth"),
          count(lit(1)).as("n_frames"))
        .orderBy("block_bucket")
    },
    withDomain(s"""SELECT t.block_number // 100 AS block_bucket,
      ${sqlSum("CAST(t.gas_used * (t.priority_fee + b.base_fee) AS DOUBLE) / 1e9")} AS gas_eth,
      ${sqlSum("CAST(t.gas_used * t.priority_fee AS DOUBLE) / 1e9")} AS tip_eth,
      COUNT(*) AS n_frames
      FROM trace t JOIN blocks b ON t.block_number = b.block_number
      GROUP BY 1 ORDER BY 1"""))

  /** F8 max_arb_delta bound (cex_dex_markout.rs:709): clamp implausible
    * profits to a sanity ceiling. */
  private val f8MaxArbDelta = QueryDef(
    "f8_max_arb_delta",
    (s, dir) => Accounting.bundleHeaders(s, dir)
      .withColumn("clamped", least(col("profit_usd"), lit(100000.0)))
      .agg(count(lit(1)).as("n_txs"),
        sum(when(col("profit_usd") > 100000.0, 1L).otherwise(0L)).as("n_clamped"),
        dsum(col("clamped")).as("sum_clamped")),
    withDomain(s"""SELECT COUNT(*) AS n_txs,
      CAST(SUM(CASE WHEN profit_usd > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
      ${sqlSum("LEAST(profit_usd, 100000.0)")} AS sum_clamped
      FROM header"""))

  /** F10 UniV2 constant-product math (protocols/uniswap_v2): expected
    * output from synthetic reserves, x·y=k with the 0.3% fee. */
  private val f10PoolMath = QueryDef(
    "f10_pool_math",
    (s, dir) => {
      val p = ChainFixture.pools(s)
        .select(col("address").as("p_addr"), col("pool_id"))
      ChainFixture.actionsTable(s, dir)
        .filter(col("action_type") === "swap" && col("amount_in").isNotNull)
        .join(broadcast(p), col("pool") === col("p_addr"))
        .withColumn("r0", lit(1000000.0) + col("pool_id") * 1000.0)
        .withColumn("r1", lit(2000000.0) + col("pool_id") * 500.0)
        .withColumn("expected_out",
          col("amount_in") * 997.0 * col("r1") /
            (col("r0") * 1000.0 + col("amount_in") * 997.0))
        .groupBy("protocol")
        .agg(count(lit(1)).as("n"), dsum(col("expected_out")).as("sum_expected"))
        .orderBy("protocol")
    },
    withDomain(s"""SELECT a.protocol, COUNT(*) AS n,
      ${sqlSum("a.amount_in * 997.0 * (2000000.0 + p.pool_id * 500.0) / ((1000000.0 + p.pool_id * 1000.0) * 1000.0 + a.amount_in * 997.0)")} AS sum_expected
      FROM actions a JOIN pool p ON a.pool = p.address
      WHERE a.action_type = 'swap' AND a.amount_in IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** F10b UniswapV3 tick math (uniswap_v3_math/tick_math.rs): each observed
    * execution price quantizes to ⌊√rate·2^96⌋ and maps to its EXACT tick
    * via the integer inverse (`TickMath.getTickAtSqrtRatio` — the 127-bit
    * log₂ extraction + forward-chain disambiguation), codegen'd as
    * `tick_at_rate`; per-protocol tick-range stats. The oracle re-derives
    * every tick from the public constants: a libm log guess (only needs to
    * land within ±2) corrected by exact forward ratios (TickSql). */
  private val f10TickMath = QueryDef(
    "f10_tick_math",
    (s, dir) => ChainFixture.actionsTable(s, dir)
      .filter(col("action_type") === "swap" &&
        col("amount_in").isNotNull && col("amount_out").isNotNull &&
        col("amount_in") > 0 && col("amount_out") > 0)
      .withColumn("rate", col("amount_out") / col("amount_in"))
      .withColumn("sqrt_price", sqrt(col("rate")))
      .withColumn("tick", graft.functions.TickMath.tick_at_rate(col("rate")).cast("long"))
      .groupBy("protocol")
      .agg(count(lit(1)).as("n"),
        min(col("tick")).as("min_tick"), max(col("tick")).as("max_tick"),
        // explicit FLOOR on both engines: integer-division rounding for
        // negative ticks differs (truncate vs floor) between dialects
        countDistinct(floor(col("tick") / 1000.0).cast("long")).as("n_tick_buckets"),
        dsum(col("sqrt_price")).as("sum_sqrt_price"))
      .orderBy("protocol"),
    withDomainRec(s""", swr AS (
        SELECT tx_hash, trace_idx, protocol, amount_out / amount_in AS rate
        FROM actions
        WHERE action_type = 'swap' AND amount_in IS NOT NULL
          AND amount_out IS NOT NULL AND amount_in > 0 AND amount_out > 0),
      ${TickSql.tickAtRateCtes("f10i",
        "SELECT tx_hash, trace_idx, protocol, rate FROM swr",
        Seq("tx_hash", "trace_idx", "protocol"))}
      SELECT s.protocol, COUNT(*) AS n,
        MIN(t.tick) AS min_tick, MAX(t.tick) AS max_tick,
        CAST(COUNT(DISTINCT CAST(FLOOR(t.tick / 1000.0) AS BIGINT)) AS BIGINT) AS n_tick_buckets,
        ${sqlSum("SQRT(s.rate)")} AS sum_sqrt_price
      FROM swr s JOIN f10itick t
        ON t.tx_hash = s.tx_hash AND t.trace_idx = s.trace_idx
        AND t.protocol = s.protocol
      GROUP BY 1 ORDER BY 1"""))

  /** F10c UniswapV3 tick-CROSSING swap engine
    * (uniswap_v3_math/{tick_math,tick_bitmap,bit_math}.rs + swap loop in
    * protocols/uniswap_v3/mod.rs): an exact-input token0 swap walks DOWN
    * through per-tick-range liquidity, consuming each range's token0
    * capacity Δx = L·(1/√P_lo − 1/√P_start) and emitting Δy = L·(√P_start −
    * √P_end), crossing initialized boundaries until the input is spent.
    *
    * Re-expressed Spark-first: instead of a sequential per-swap loop, the
    * ranges at-or-below each swap's start tick are EXPLODED via an
    * equi-join on pool, a running window sum accumulates capacity in walk
    * order (k descending), and each range resolves to full / partial /
    * untouched — the j5 progressive-fill shape, fully distributed and
    * linear in swaps × ranges.
    *
    * Fixture ticks: 16 ranges of 10 ticks per v3 pool, deterministic
    * per-range liquidity, and EXACT Q64.96 boundary prices: √P(t) =
    * sqrt_ratio_at_tick(t) / 2^96 (TickMath's integer product chain —
    * codegen'd, applied on the DIMENSION side so the per-boundary
    * BigInteger cost is amortized across all fact rows). The oracle
    * derives the same ratios from the public constants via TickSql's
    * UHUGEINT limb chain; ratio→double is correctly rounded on both
    * engines, and all walk arithmetic downstream is plain IEEE on
    * bit-identical inputs. */
  private val f10TickCross = QueryDef(
    "f10_tick_cross",
    (s, dir) => {
      val p = ChainFixture.pools(s)
        .filter(col("protocol") === "uniswap_v3")
        .select(col("address").as("p_addr"), col("pool_id"))
        .withColumn("cur_t", (col("pool_id") * 7) % 80 - 40)
      def px(t: org.apache.spark.sql.Column) =
        graft.functions.TickMath.sqrt_ratio_at_tick(t.cast("int"))
          .cast("double") / lit(graft.functions.TickMath.P96d)
      val ranges = s.range(-8, 8).select(col("id").as("k"))
        .crossJoin(p.select(col("pool_id").as("r_pool"), col("cur_t").as("r_cur")))
        .withColumn("liq",
          lit(10000.0) + col("r_pool") * 1000.0 + abs(col("k")) * 500.0)
        .withColumn("s_px", px(least((col("k") + 1) * 10, col("r_cur"))))
        .withColumn("e_px", px(col("k") * 10))
        .drop("r_cur")
      val w = Window.partitionBy("pool_id", "tx_hash", "trace_idx")
        .orderBy(col("k").desc)
      val walk = ChainFixture.actionsTable(s, dir)
        .filter(col("action_type") === "swap" &&
          col("amount_in").isNotNull && col("amount_in") > 0)
        .join(broadcast(p), col("pool") === col("p_addr"))
        .withColumn("amt_eff", col("amount_in") * 0.997)
        .join(ranges, col("pool_id") === col("r_pool") &&
          col("k") * 10 <= col("cur_t"))
        .withColumn("cap", col("liq") * (lit(1.0) / col("e_px") - lit(1.0) / col("s_px")))
        .withColumn("cum", coalesce(
          sum(col("cap")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
        .filter(col("cum") < col("amt_eff"))
        .withColumn("full", col("cum") + col("cap") <= col("amt_eff"))
        .withColumn("out_tok1", when(col("full"), col("liq") * (col("s_px") - col("e_px")))
          .otherwise(col("liq") * (col("s_px") -
            lit(1.0) / (lit(1.0) / col("s_px") +
              (col("amt_eff") - col("cum")) / col("liq")))))
      walk.groupBy("pool_id")
        .agg(countDistinct(col("tx_hash"), col("trace_idx")).as("n_swaps"),
          sum(when(col("full"), 1L).otherwise(0L)).as("n_crossed"),
          sum(when(col("full") && col("k") === -8, 1L).otherwise(0L)).as("n_exhausted"),
          dsumR(col("out_tok1")).as("sum_out"))
        .orderBy("pool_id")
    },
    withDomainRec(s""", ${TickSql.ratioCtes("f10b",
        // DISTINCT over a subquery, NOT a top-level UNION: inside WITH
        // RECURSIVE DuckDB gives any top-level-UNION CTE body anchor/step
        // treatment even without self-reference, and rows duplicate
        """SELECT DISTINCT tick FROM (
             SELECT 10 * k AS tick FROM range(-8, 9) t(k)
             UNION ALL SELECT (pool_id * 7) % 80 - 40 FROM pool
             WHERE protocol = 'uniswap_v3') u""")},
      tickr AS (
        SELECT p.pool_id AS r_pool, r.k,
          10000.0e0 + p.pool_id * 1000.0e0 + ABS(r.k) * 500.0e0 AS liq,
          bs.px AS s_px, be.px AS e_px
        FROM pool p
        CROSS JOIN range(-8, 8) r(k)
        JOIN f10bpx be ON be.tick = r.k * 10
        JOIN f10bpx bs ON bs.tick = LEAST((r.k + 1) * 10, (p.pool_id * 7) % 80 - 40)
        WHERE p.protocol = 'uniswap_v3'),
      walk0 AS (
        SELECT p.pool_id, a.tx_hash, a.trace_idx, t.k, t.liq,
          a.amount_in * 0.997e0 AS amt_eff, t.s_px, t.e_px
        FROM actions a
        JOIN pool p ON a.pool = p.address AND p.protocol = 'uniswap_v3'
        JOIN tickr t ON t.r_pool = p.pool_id
                    AND t.k * 10 <= (p.pool_id * 7) % 80 - 40
        WHERE a.action_type = 'swap' AND a.amount_in IS NOT NULL
          AND a.amount_in > 0),
      walk1 AS (
        SELECT *, liq * (1.0e0 / e_px - 1.0e0 / s_px) AS cap,
          COALESCE(SUM(liq * (1.0e0 / e_px - 1.0e0 / s_px)) OVER (
            PARTITION BY pool_id, tx_hash, trace_idx ORDER BY k DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0e0) AS cum
        FROM walk0),
      walk2 AS (
        SELECT *, (cum + cap <= amt_eff) AS is_full,
          CASE WHEN cum + cap <= amt_eff THEN liq * (s_px - e_px)
               ELSE liq * (s_px - 1.0e0 / (1.0e0 / s_px + (amt_eff - cum) / liq))
          END AS out_tok1
        FROM walk1 WHERE cum < amt_eff)
      SELECT pool_id,
        CAST(COUNT(DISTINCT (tx_hash, trace_idx)) AS BIGINT) AS n_swaps,
        CAST(SUM(CASE WHEN is_full THEN 1 ELSE 0 END) AS BIGINT) AS n_crossed,
        CAST(SUM(CASE WHEN is_full AND k = -8 THEN 1 ELSE 0 END) AS BIGINT) AS n_exhausted,
        ${sqlSumR("out_tok1")} AS sum_out
      FROM walk2 GROUP BY 1 ORDER BY 1"""))

  /** S4 parquet export sink (brontes-db parquet/mod.rs): partitionBy write
    * + read-back — the sink is the op; the oracle recomputes the partition
    * stats directly. */
  private val s4PartitionedSink = QueryDef(
    "s4_partitioned_sink",
    (s, dir) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_s4_sink"
      Tables.orders(s, dir)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
      s.read.parquet(out)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
      ${sqlSum("o_totalprice")} AS sum_price
      FROM orders GROUP BY 1 ORDER BY 1"""))
}
