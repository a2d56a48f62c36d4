package graft.domain

import graft.{QueryDef, QueryModule, Tables}
import graft.ops.ExactAgg._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fidelity upgrades for inventory rows VERDICT r1 scored partial:
  * S3 (SQL-text source), P3 (trace_address prefix spans), A5 (wide
  * BlockAnalysis), F5 (ABI decode registry), R3 (pricer rendezvous),
  * Q6 (JIT-cex-dex composition).
  */
object FidelityOps extends QueryModule {

  import Accounting._
  import ChainFixture._

  def defs: Seq[QueryDef] = Seq(s3SqlSource, p3SpanPrefix, a5BlockAnalysisWide,
    f5AbiDecode, f5AbiDecodeBin, r3Rendezvous, q6JitCexDex, s2ActionsRangeScan,
    j2DexAsof)

  /** J2 (domain form): usd_delta_by_address — token deltas valued by the
    * LAST OBSERVED DexQuote at-or-before the delta's tx index
    * (price_at_or_before, db/dex.rs:183), via the one-shuffle as-of join.
    * Quote series: per token, the VWAP of swaps selling it, keyed by the
    * global (block·16 + tx) order. */
  private val j2DexAsof = QueryDef(
    "j2_dex_asof",
    (s, dir) => {
      val a = actionsTable(s, dir)
      val quotes = a.filter(col("action_type") === "swap" &&
          col("amount_in").isNotNull && col("amount_out").isNotNull)
        .groupBy(col("token_in_id").as("token_id"),
          (col("block_number") * TxPerBlock + col("tx_idx")).as("ord"))
        .agg((dsum(col("amount_out")) / dsum(col("amount_in"))).as("px"))
      val d = Accounting.deltas(a)
        .withColumn("ord", col("block_number") * TxPerBlock + col("tx_idx"))
        .select("tx_hash", "eoa", "token_id", "delta", "ord")
      // 42 token ids can't parallelize a bare-key window at scale — salt
      // by 250-block ord buckets (16 tx slots per block) with carry-over
      graft.ops.AsOfJoin.backwardSalted(d, quotes, Seq("token_id"), "ord", "px",
        "asof_px", bucketSpan = 250L * TxPerBlock)
        .groupBy("eoa")
        .agg(count(lit(1)).as("n_deltas"),
          sum(when(col("asof_px").isNotNull, 1L).otherwise(0L)).as("n_priced"),
          dsumR(col("delta") * coalesce(col("asof_px"), lit(0.0))).as("usd_value"))
        .orderBy("eoa")
    },
    withCtes(s"""quotes AS (
        SELECT token_in_id AS token_id,
          block_number * $TxPerBlock + tx_idx AS ord,
          ${sqlSum("amount_out")} / ${sqlSum("amount_in")} AS px
        FROM actions
        WHERE action_type = 'swap' AND amount_in IS NOT NULL AND amount_out IS NOT NULL
        GROUP BY 1, 2),
      dd AS (
        SELECT tx_hash, eoa, token_id, delta,
          block_number * $TxPerBlock + tx_idx AS ord
        FROM deltas)
      SELECT dd.eoa AS eoa, COUNT(*) AS n_deltas,
        CAST(SUM(CASE WHEN q.px IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_priced,
        ${sqlSumR("dd.delta * COALESCE(q.px, 0.0)")} AS usd_value
      FROM dd ASOF LEFT JOIN quotes q
        ON dd.token_id = q.token_id AND dd.ord >= q.ord
      GROUP BY 1 ORDER BY 1"""))

  /** S2 (domain form): block-range scan against the PARTITIONED actions
    * store — the filter hits the `block_bucket` partition column, so the
    * scan reads only the touched buckets (PlanSpec asserts the pruning). */
  private val s2ActionsRangeScan = QueryDef(
    "s2_actions_range_scan",
    (s, dir) => actionsTable(s, dir)
      .filter(col("block_bucket") === 2 &&
        col("block_number").between(500, 600))
      .groupBy("block_number")
      .agg(count(lit(1)).as("n_actions"),
        countDistinct(col("tx_hash")).as("n_txs"))
      .orderBy("block_number"),
    withCtes("""ignored AS (SELECT 1)
      SELECT block_number, COUNT(*) AS n_actions,
        CAST(COUNT(DISTINCT tx_hash) AS BIGINT) AS n_txs
      FROM actions
      WHERE block_number // 250 = 2 AND block_number BETWEEN 500 AND 600
      GROUP BY 1 ORDER BY 1"""))

  private def withCtes(sql: String) = Some(s"WITH $sqlDomainCtes, $sql")

  /** S3: the ClickHouse-SQL-source path — the engine accepts SQL TEXT over
    * registered tables (spark.sql), not just the DataFrame API; re-expresses
    * most_volume_pair_exchange.sql's groupArray+arraySort shape. */
  private val s3SqlSource = QueryDef(
    "s3_sql_source",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql(s"""SELECT o_orderpriority,
          COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
          element_at(array_sort(collect_list(o_orderkey)), 1) AS min_key
        FROM orders_v GROUP BY 1 ORDER BY 1""")
    },
    Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
      ${sqlSum("o_totalprice")} AS sum_price,
      (list_sort(list(o_orderkey)))[1] AS min_key
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** P3 full fidelity: contiguous subtree collection via trace_address
    * PREFIX matching — the fixture's frames carry a TRUE variable-depth
    * call-tree path; a span is every frame whose path starts with the span
    * root's full path (tree/node.rs:515). Roots are mint-selector frames at
    * ANY depth, so a depth-2 root collects only its own nested slice, not
    * the whole depth-1 subtree. Join stays equi-keyed on (tx, head); the
    * prefix slice-compare is a post-filter inside the matched subtree. */
  private val p3SpanPrefix = QueryDef(
    "p3_span_prefix",
    (s, dir) => {
      val t = tracesTable(s, dir)
      val roots = t.filter(col("selector") === SelMint)
        .select(col("tx_hash").as("r_tx"), col("trace_address").as("r_path"))
        .distinct()
      t.join(roots, col("tx_hash") === col("r_tx") &&
          element_at(col("trace_address"), 1) === element_at(col("r_path"), 1))
        .filter(slice(col("trace_address"), lit(1), size(col("r_path"))) === col("r_path"))
        .groupBy("r_tx", "r_path")
        .agg(count(lit(1)).as("span_size"),
          max(size(col("r_path"))).cast("long").as("root_depth"))
        .groupBy("span_size", "root_depth")
        .agg(count(lit(1)).as("n_spans"))
        .orderBy("span_size", "root_depth")
    },
    withCtes(s"""p3roots AS (
        SELECT DISTINCT tx_hash AS r_tx, trace_address AS r_path
        FROM trace WHERE selector = '$SelMint'),
      p3spans AS (
        SELECT r.r_tx, r.r_path, COUNT(*) AS span_size,
          MAX(len(r.r_path)) AS root_depth
        FROM trace t JOIN p3roots r
          ON t.tx_hash = r.r_tx AND t.trace_address[1] = r.r_path[1]
        WHERE t.trace_address[1:len(r.r_path)] = r.r_path
        GROUP BY 1, 2)
      SELECT span_size, CAST(root_depth AS BIGINT) AS root_depth,
        COUNT(*) AS n_spans
      FROM p3spans GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** A5 full fidelity: the wide one-pass BlockAnalysis — per-category
    * totals, top-entity argmaxes, distincts, ratios (block_analysis.rs:
    * 658-2150). The reference macro-generates its ~200-column matrix per
    * MEV category; here the matrix is generated the same way — a column
    * family of 11 metrics per ACTION category (66 cols) PLUS a family of
    * 11 metrics per inspector-output MEV category (sandwich/jit/
    * liquidation/arb/cexdex — 55 cols: bundle count, distinct eoas/blocks,
    * revenue/gas/profit exact sums, max/min/avg profit,
    * average_profit_margin (block_analysis.rs:2024), top searcher by
    * profit :1903), candidates drawn from the shared inspector
    * intermediates and valued by the A1–A3 bundle header, plus the
    * per-category most_transacted {pool, pair, dex} double argmax
    * (:2072-2110) — 243 columns total, still zero Expand (distincts via
    * distinct-pair passes, PlanSpec-pinned). */
  private val A5Categories =
    Seq("swap", "transfer", "mint", "burn", "liquidation", "unclassified")

  /** MEV-category family keys (the reference's BlockAnalysis grain). */
  private val A5MevTypes =
    Seq("sandwich", "jit", "liquidation", "arb", "cexdex")

  private val a5BlockAnalysisWide = QueryDef(
    "a5_block_analysis_wide",
    (s, dir) => {
      val a = actionsTable(s, dir)
      // Per-category column family WITHOUT multi-countDistinct: 16 distinct
      // aggregates in one groupBy would Expand every action row ~17× (the
      // 13.5s plan). Instead aggregate at (bucket, action_type) grain with
      // plain map-side-combining hash aggs, get the two distinct counts
      // from distinct-pair passes, and pivot the tiny per-category frame —
      // three linear scans, zero Expand, same semantics (oracle unchanged).
      def bucketed = expr("block_number div 100").as("block_bucket")
      val hasPool = col("pool").isNotNull
      val catBase = a.groupBy(bucketed, col("action_type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("amount_in")).as("in_v"),
          dsum(col("amount_out")).as("out_v"),
          max(col("amount_in")).as("maxin"),
          max_by(col("from_address"),
            struct(coalesce(col("amount_in"), lit(-1.0)),
              col("trace_idx"), col("from_address"))).as("top"),
          max_by(when(hasPool, col("pool")),
            when(hasPool, struct(coalesce(col("amount_in"), lit(-1.0)),
              col("trace_idx"), col("pool")))).as("toppool"),
          sum(col("gas_used")).as("gas"),
          sum(col("priority_fee")).as("fee"))
      val ntx = a.select(bucketed, col("action_type"), col("tx_hash"))
        .distinct()
        .groupBy("block_bucket", "action_type")
        .agg(count(lit(1)).as("ntx"))
      val catJ = catBase
        .join(ntx, Seq("block_bucket", "action_type"), "left")
      val catAggs = A5Categories.flatMap { t =>
        val is = col("action_type") === t
        Seq(
          coalesce(max(when(is, col("n"))), lit(0L)).as(s"n_$t"),
          coalesce(max(when(is, col("ntx"))), lit(0L)).as(s"ntx_$t"),
          max(when(is, col("in_v"))).as(s"in_$t"),
          max(when(is, col("out_v"))).as(s"out_$t"),
          max(when(is, col("maxin"))).as(s"maxin_$t"),
          max(when(is, col("top"))).as(s"top_$t"),
          max(when(is, col("toppool"))).as(s"toppool_$t"),
          coalesce(max(when(is, col("gas"))), lit(0L)).as(s"gas_$t"),
          coalesce(max(when(is, col("fee"))), lit(0L)).as(s"fee_$t"))
      }
      val wide = catJ.groupBy("block_bucket")
        .agg(catAggs.head, catAggs.tail: _*)
      // ── the reference's per-category ARGMAX arms (top_searcher_by_profit
      //    :1903, most_transacted :2072): top eoa / fund by summed volume,
      //    busiest pool / pair by action count. Each is one linear pass at
      //    (bucket, category, entity) grain + a tiny pivot — still no
      //    Expand, still map-side-combining hash aggs.
      def bkt = expr("block_number div 100").as("block_bucket")
      def argmaxTop(grain: DataFrame, entity: String, metric: org.apache.spark.sql.Column) =
        grain.groupBy("block_bucket", "action_type")
          .agg(max(struct(metric.as("m"), col(entity).as("e"))).as("s"))
          .select(col("block_bucket"), col("action_type"),
            col("s.e").as("top_e"), col("s.m").as("top_m"))
      def pivot2(top: DataFrame, prefix: String) = {
        val aggs = A5Categories.flatMap { t =>
          val is = col("action_type") === t
          Seq(max(when(is, col("top_e"))).as(s"${prefix}_$t"),
            max(when(is, col("top_m"))).as(s"${prefix}_v_$t"))
        }
        top.groupBy("block_bucket").agg(aggs.head, aggs.tail: _*)
      }
      val fundMeta = ChainFixture.fundMeta(s)
      // the distinct-entity COUNT and the top-entity ARGMAX share the
      // (bucket, category, entity) grain, so ONE scan feeds both (the
      // separate neoa/npool distinct-pair passes were two more scans of
      // actions computing the same grain). count(e) skips the NULL-entity
      // group, matching the oracle's COUNT(DISTINCT CASE ...) semantics
      // (ADVICE r6's latent NULL divergence, fixed here for the category
      // grain too); the argmax keeps the NULL group, exactly as before.
      def fusedPivot(grain: DataFrame, countName: String, prefix: String) = {
        val roll = grain.groupBy("block_bucket", "action_type")
          .agg(count(col("e")).as("cnt"),
            max(struct(col("v").as("m"), col("e"))).as("s"))
        val aggs = A5Categories.flatMap { t =>
          val is = col("action_type") === t
          Seq(coalesce(max(when(is, col("cnt"))), lit(0L)).as(s"${countName}_$t"),
            max(when(is, col("s.e"))).as(s"${prefix}_$t"),
            max(when(is, col("s.m"))).as(s"${prefix}_v_$t"))
        }
        roll.groupBy("block_bucket").agg(aggs.head, aggs.tail: _*)
      }
      val eoaTop = fusedPivot(
        a.groupBy(bkt, col("action_type"), col("from_address").as("e"))
          .agg(coalesce(dsum(col("amount_in")), lit(-1.0)).as("v")),
        "neoa", "topvol")
      val fundTop = pivot2(argmaxTop(
        a.join(broadcast(fundMeta), col("from_address") === col("m_eoa"))
          .groupBy(bkt, col("action_type"), col("fund"))
          .agg(coalesce(dsum(col("amount_in")), lit(-1.0)).as("v")),
        "fund", col("v")), "topfund")
      val poolTop = fusedPivot(
        a.filter(col("pool").isNotNull)
          .groupBy(bkt, col("action_type"), col("pool").as("e"))
          .agg(count(lit(1)).cast("double").as("v")),
        "npool", "bpool")
      val pairTop = pivot2(argmaxTop(
        a.filter(col("token_in_id").isNotNull)
          .withColumn("pairkey", concat(
            least(col("token_in_id"), coalesce(col("token_out_id"), col("token_in_id"))),
            lit(":"),
            greatest(col("token_in_id"), coalesce(col("token_out_id"), col("token_in_id")))))
          .groupBy(bkt, col("action_type"), col("pairkey"))
          .agg(count(lit(1)).cast("double").as("v")),
        "pairkey", col("v")), "bpair")
      // per-block distincts as distinct-pair passes (same no-Expand pattern
      // as the category matrix: a 3-way countDistinct here would Expand
      // every action row 4×)
      // NULL keys are filtered BEFORE the distinct-pair pass and the joined
      // count coalesces to 0, so sparse buckets agree with the oracle's
      // COUNT(DISTINCT ..) NULL semantics (ADVICE r6)
      // the per-block rollup and the distinct-tx count fuse the same way:
      // partial-aggregate at (block, tx) grain once, then roll up to block
      // grain — n_txs is the grain-row count, every other metric is an
      // associative fold of its partial (decimal partials stay DECIMAL
      // between the stages, so the two-stage sum is bit-identical to the
      // single-stage dsum). Was two scans of actions; now one.
      val beoa = a.filter(col("from_address").isNotNull)
        .select(col("block_number"), col("from_address")).distinct()
        .groupBy("block_number").agg(count(lit(1)).as("n_eoas"))
      val bpool = a.filter(col("pool").isNotNull)
        .select(col("block_number"), col("pool")).distinct()
        .groupBy("block_number").agg(count(lit(1)).as("n_pools"))
      val txg = a.groupBy(col("block_number"), col("tx_hash"))
        .agg(count(lit(1)).as("c"),
          sum(when(col("action_type") === "swap", 1L).otherwise(0L)).as("csw"),
          sum(when(col("action_type") === "transfer", 1L).otherwise(0L)).as("ctr"),
          sum(when(col("action_type") === "liquidation", 1L).otherwise(0L)).as("cliq"),
          sum(when(col("action_type") === "unclassified", 1L).otherwise(0L)).as("cun"),
          dsumPartial(col("amount_in")).as("din"),
          dsumPartial(col("amount_out")).as("dout"),
          max(struct(coalesce(col("amount_in"), lit(-1.0)).as("a"),
            col("trace_idx").as("t"), col("from_address").as("e"))).as("tops"),
          max(col("amount_in")).as("maxin"))
      val perBlock = txg.groupBy("block_number").agg(
        sum(col("c")).as("n_actions"),
        count(col("tx_hash")).as("n_txs"),
        sum(col("csw")).as("n_swaps"),
        sum(col("ctr")).as("n_transfers"),
        sum(col("cliq")).as("n_liqs"),
        sum(col("cun")).as("n_uncls"),
        sum(col("din")).cast("double").as("sum_in"),
        sum(col("dout")).cast("double").as("sum_out"),
        max(col("tops")).getField("e").as("top_eoa"),
        max(col("maxin")).as("biggest_amount"))
      // ── MEV-category families keyed by INSPECTOR OUTPUT (the reference's
      //    BlockAnalysis grain: block_analysis.rs:658-2150 pivots per MEV
      //    type, not per action type): tx-grain candidates from the shared
      //    inspector intermediates, valued by the A1–A3 bundle header.
      //    Same no-Expand shape — one hash agg per family + two
      //    distinct-pair passes + a tiny pivot.
      val liqTx = a.filter(col("action_type") === "liquidation")
        .select("tx_hash").distinct()
      val loneSwap = a.filter(col("action_type") === "swap" &&
          col("amount_in").isNotNull && col("amount_out").isNotNull)
        .groupBy("tx_hash").agg(count(lit(1)).as("n_sw"))
        .filter(col("n_sw") === 1).select("tx_hash")
      // materialized like the inspector bundle tables (candidates are a
      // pipeline intermediate; re-deriving jitPairs/arbs inline cost a5
      // +4.8s at sf0.1)
      val cand = ChainFixture.materialize(s,
        s"mevcand_${ChainFixture.dirKey(dir)}",
        InspectorOps.sandwiches(s, dir)
          .select(col("front_tx").as("tx_hash")).distinct()
          .withColumn("mev_type", lit("sandwich"))
          .unionByName(InspectorOps.jitPairs(s, dir).select("tx_hash").distinct()
            .withColumn("mev_type", lit("jit")))
          .unionByName(liqTx.withColumn("mev_type", lit("liquidation")))
          .unionByName(InspectorOps.arbs(s, dir).select("tx_hash").distinct()
            .withColumn("mev_type", lit("arb")))
          .unionByName(loneSwap.withColumn("mev_type", lit("cexdex"))))
      val hdr = Accounting.bundleHeaders(s, dir)
        .select(col("tx_hash"), col("block_number").as("h_block"), col("eoa"),
          col("revenue_usd"), col("gas_usd"), col("profit_usd"))
      val mev = cand.join(hdr, "tx_hash")
        .withColumn("block_bucket", expr("h_block div 100"))
      val mevAgg = mev.groupBy("block_bucket", "mev_type")
        .agg(count(lit(1)).as("mn"),
          dsum(col("revenue_usd")).as("mrev"),
          dsumR(col("gas_usd")).as("mgas"),
          dsumR(col("profit_usd")).as("mprofit"),
          max(col("profit_usd")).as("mmaxp"),
          min(col("profit_usd")).as("mminp"),
          max_by(col("eoa"),
            struct(col("profit_usd"), col("tx_hash"), col("eoa"))).as("mtop"),
          sum(when(col("revenue_usd") =!= 0.0, 1L).otherwise(0L)).as("mnm"),
          dsumR(when(col("revenue_usd") =!= 0.0,
            col("profit_usd") / col("revenue_usd"))).as("mmsum"))
        .withColumn("mavgp", col("mprofit") / col("mn"))
        .withColumn("mmargin", when(col("mnm") > 0, col("mmsum") / col("mnm")))
      val mevEoa = mev.select("block_bucket", "mev_type", "eoa").distinct()
        .groupBy("block_bucket", "mev_type").agg(count(lit(1)).as("mneoa"))
      val mevBlk = mev.select("block_bucket", "mev_type", "h_block").distinct()
        .groupBy("block_bucket", "mev_type").agg(count(lit(1)).as("mnblk"))
      val mevAggs = A5MevTypes.flatMap { t =>
        val is = col("mev_type") === t
        Seq(
          coalesce(max(when(is, col("mn"))), lit(0L)).as(s"mev_n_$t"),
          coalesce(max(when(is, col("mneoa"))), lit(0L)).as(s"mev_neoa_$t"),
          coalesce(max(when(is, col("mnblk"))), lit(0L)).as(s"mev_nblk_$t"),
          max(when(is, col("mrev"))).as(s"mev_rev_$t"),
          max(when(is, col("mgas"))).as(s"mev_gas_$t"),
          max(when(is, col("mprofit"))).as(s"mev_profit_$t"),
          max(when(is, col("mmaxp"))).as(s"mev_maxp_$t"),
          max(when(is, col("mminp"))).as(s"mev_minp_$t"),
          max(when(is, col("mavgp"))).as(s"mev_avgp_$t"),
          max(when(is, col("mmargin"))).as(s"mev_margin_$t"),
          max(when(is, col("mtop"))).as(s"mev_top_$t"))
      }
      val mevWide = mevAgg
        .join(mevEoa, Seq("block_bucket", "mev_type"), "left")
        .join(mevBlk, Seq("block_bucket", "mev_type"), "left")
        .groupBy("block_bucket")
        .agg(mevAggs.head, mevAggs.tail: _*)
      // ── per-MEV-category most_transacted families (block_analysis.rs:
      //    2072-2110): busiest pool / pair / dex per MEV type, argmax by
      //    summed bundle profit AND by summed profit+tip revenue — the
      //    reference's `most_transacted` double argmax. Its Vec flatten
      //    re-counts duplicate entities inside one bundle; here the
      //    tx→entity map is DISTINCT per tx (documented adaptation, the
      //    oracle identical). Same no-Expand shape: one hash agg at
      //    (bucket, type, entity) grain per family + a tiny pivot; ties
      //    break on the entity (the struct max / list-order pair). */
      val pairKeyCol = concat(
        least(col("token_in_id"), coalesce(col("token_out_id"), col("token_in_id"))),
        lit(":"),
        greatest(col("token_in_id"), coalesce(col("token_out_id"), col("token_in_id"))))
      // the three families STACK into one frame (`fam` tag) so the whole
      // most_transacted surface costs ONE mev-join + one grain agg + one
      // pivot, not three of each
      val mtEntities = a.filter(col("pool").isNotNull)
        .select(col("tx_hash"), lit("pool").as("fam"), col("pool").as("e"))
        .unionByName(a.filter(col("token_in_id").isNotNull)
          .select(col("tx_hash"), lit("pair").as("fam"), pairKeyCol.as("e")))
        .unionByName(a.filter(col("pool").isNotNull)
          .select(col("tx_hash"), lit("dex").as("fam"), col("protocol").as("e")))
        .distinct()
      val mtArg = mev.join(mtEntities, "tx_hash")
        .groupBy(col("block_bucket"), col("mev_type"), col("fam"), col("e"))
        .agg(dsumR(col("profit_usd")).as("vp"),
          dsumR(col("revenue_usd")).as("vr"))
        .groupBy("block_bucket", "mev_type", "fam")
        .agg(max(struct(col("vp"), col("e"))).as("sp"),
          max(struct(col("vr"), col("e"))).as("sr"))
      val mtAggs = Seq("pool", "pair", "dex").flatMap { fam =>
        A5MevTypes.flatMap { t =>
          val is = col("mev_type") === t && col("fam") === fam
          Seq(max(when(is, col("sp.e"))).as(s"mt_${fam}_p_$t"),
            max(when(is, col("sp.vp"))).as(s"mt_${fam}_p_v_$t"),
            max(when(is, col("sr.e"))).as(s"mt_${fam}_r_$t"),
            max(when(is, col("sr.vr"))).as(s"mt_${fam}_r_v_$t"))
        }
      }
      val mtWideAll = mtArg.groupBy("block_bucket")
        .agg(mtAggs.head, mtAggs.tail: _*)
      perBlock
        .join(beoa, "block_number")
        .join(bpool, Seq("block_number"), "left")
        .groupBy(expr("block_number div 100").as("block_bucket"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(col("n_actions")).as("n_actions"), sum(col("n_txs")).as("n_txs"),
          sum(col("n_swaps")).as("n_swaps"), sum(col("n_transfers")).as("n_transfers"),
          sum(col("n_liqs")).as("n_liqs"), sum(col("n_uncls")).as("n_uncls"),
          dsum(col("sum_in")).as("sum_in"), dsum(col("sum_out")).as("sum_out"),
          // collect_set, not countDistinct: a lone distinct agg in this
          // mixed rollup would Expand the (already block-grain) frame
          size(collect_set(col("top_eoa"))).cast("long").as("n_top_eoas"),
          max(col("biggest_amount")).as("biggest_amount"),
          max(coalesce(col("n_pools"), lit(0L))).as("max_pools_per_block"),
          max(col("n_eoas")).as("max_eoas_per_block"))
        .join(wide, "block_bucket")
        .join(eoaTop, "block_bucket")
        .join(fundTop, "block_bucket")
        .join(poolTop, Seq("block_bucket"), "left")
        .join(pairTop, Seq("block_bucket"), "left")
        .join(mevWide, Seq("block_bucket"), "left")
        .join(mtWideAll, Seq("block_bucket"), "left")
        // a bucket with no pooled actions has no poolTop row at all; its
        // npool counts are 0 (the oracle's COUNT(DISTINCT ..) = 0), while
        // its bpool argmax columns stay NULL as before
        .na.fill(0L, A5Categories.map(t => s"npool_$t"))
        .orderBy("block_bucket")
    },
    Some(s"""WITH $sqlDomainCtes,
      ${InspectorOps.sandwichCtes}, ${InspectorOps.arbCte},
      ${InspectorOps.jitpCte},
      catw AS (
        SELECT block_number // 100 AS block_bucket,
          ${A5Categories.map { t =>
            s"""CAST(SUM(CASE WHEN action_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t,
          CAST(COUNT(DISTINCT CASE WHEN action_type = '$t' THEN tx_hash END) AS BIGINT) AS ntx_$t,
          CAST(COUNT(DISTINCT CASE WHEN action_type = '$t' THEN from_address END) AS BIGINT) AS neoa_$t,
          CAST(COUNT(DISTINCT CASE WHEN action_type = '$t' THEN pool END) AS BIGINT) AS npool_$t,
          ${sqlSum(s"CASE WHEN action_type = '$t' THEN amount_in END")} AS in_$t,
          ${sqlSum(s"CASE WHEN action_type = '$t' THEN amount_out END")} AS out_$t,
          MAX(CASE WHEN action_type = '$t' THEN amount_in END) AS maxin_$t,
          (list(from_address ORDER BY COALESCE(amount_in, -1.0) DESC,
                trace_idx DESC, from_address DESC)
             FILTER (WHERE action_type = '$t'))[1] AS top_$t,
          (list(pool ORDER BY COALESCE(amount_in, -1.0) DESC,
                trace_idx DESC, pool DESC)
             FILTER (WHERE action_type = '$t' AND pool IS NOT NULL))[1] AS toppool_$t,
          CAST(COALESCE(SUM(CASE WHEN action_type = '$t' THEN gas_used END), 0) AS BIGINT) AS gas_$t,
          CAST(COALESCE(SUM(CASE WHEN action_type = '$t' THEN priority_fee END), 0) AS BIGINT) AS fee_$t"""
          }.mkString(",\n          ")}
        FROM actions GROUP BY 1),
      blkw AS (
        SELECT block_number, COUNT(*) AS n_actions,
          CAST(COUNT(DISTINCT tx_hash) AS BIGINT) AS n_txs,
          CAST(COUNT(DISTINCT from_address) AS BIGINT) AS n_eoas,
          CAST(COUNT(DISTINCT pool) AS BIGINT) AS n_pools,
          SUM(CASE WHEN action_type = 'swap' THEN 1 ELSE 0 END) AS n_swaps,
          SUM(CASE WHEN action_type = 'transfer' THEN 1 ELSE 0 END) AS n_transfers,
          SUM(CASE WHEN action_type = 'liquidation' THEN 1 ELSE 0 END) AS n_liqs,
          SUM(CASE WHEN action_type = 'unclassified' THEN 1 ELSE 0 END) AS n_uncls,
          ${sqlSum("amount_in")} AS sum_in,
          ${sqlSum("amount_out")} AS sum_out,
          (list(from_address ORDER BY COALESCE(amount_in, -1.0) DESC,
                trace_idx DESC, from_address DESC))[1] AS top_eoa,
          MAX(amount_in) AS biggest_amount
        FROM actions GROUP BY 1),
      rollw AS (
        SELECT block_number // 100 AS block_bucket, COUNT(*) AS n_blocks,
          CAST(SUM(n_actions) AS BIGINT) AS n_actions,
          CAST(SUM(n_txs) AS BIGINT) AS n_txs,
          CAST(SUM(n_swaps) AS BIGINT) AS n_swaps,
          CAST(SUM(n_transfers) AS BIGINT) AS n_transfers,
          CAST(SUM(n_liqs) AS BIGINT) AS n_liqs,
          CAST(SUM(n_uncls) AS BIGINT) AS n_uncls,
          ${sqlSum("sum_in")} AS sum_in,
          ${sqlSum("sum_out")} AS sum_out,
          CAST(COUNT(DISTINCT top_eoa) AS BIGINT) AS n_top_eoas,
          MAX(biggest_amount) AS biggest_amount,
          MAX(n_pools) AS max_pools_per_block,
          MAX(n_eoas) AS max_eoas_per_block
        FROM blkw GROUP BY 1),
      fund_meta AS $fundMetaCteBody,
      eg AS (SELECT block_number // 100 AS block_bucket, action_type,
               from_address AS e, COALESCE(${sqlSum("amount_in")}, -1.0e0) AS v
             FROM actions GROUP BY 1, 2, 3),
      ega AS (SELECT block_bucket, action_type,
                (list(e ORDER BY v DESC, e DESC))[1] AS top_e, MAX(v) AS top_m
              FROM eg GROUP BY 1, 2),
      egp AS (SELECT block_bucket, ${A5Categories.map { t =>
                s"""MAX(CASE WHEN action_type = '$t' THEN top_e END) AS topvol_$t,
                MAX(CASE WHEN action_type = '$t' THEN top_m END) AS topvol_v_$t"""
              }.mkString(",\n                ")}
              FROM ega GROUP BY 1),
      fg AS (SELECT block_number // 100 AS block_bucket, action_type,
               m.fund AS e, COALESCE(${sqlSum("amount_in")}, -1.0e0) AS v
             FROM actions a JOIN fund_meta m ON a.from_address = m.m_eoa
             GROUP BY 1, 2, 3),
      fga AS (SELECT block_bucket, action_type,
                (list(e ORDER BY v DESC, e DESC))[1] AS top_e, MAX(v) AS top_m
              FROM fg GROUP BY 1, 2),
      fgp AS (SELECT block_bucket, ${A5Categories.map { t =>
                s"""MAX(CASE WHEN action_type = '$t' THEN top_e END) AS topfund_$t,
                MAX(CASE WHEN action_type = '$t' THEN top_m END) AS topfund_v_$t"""
              }.mkString(",\n                ")}
              FROM fga GROUP BY 1),
      pg AS (SELECT block_number // 100 AS block_bucket, action_type,
               pool AS e, CAST(COUNT(*) AS DOUBLE) AS v
             FROM actions WHERE pool IS NOT NULL GROUP BY 1, 2, 3),
      pga AS (SELECT block_bucket, action_type,
                (list(e ORDER BY v DESC, e DESC))[1] AS top_e, MAX(v) AS top_m
              FROM pg GROUP BY 1, 2),
      pgp AS (SELECT block_bucket, ${A5Categories.map { t =>
                s"""MAX(CASE WHEN action_type = '$t' THEN top_e END) AS bpool_$t,
                MAX(CASE WHEN action_type = '$t' THEN top_m END) AS bpool_v_$t"""
              }.mkString(",\n                ")}
              FROM pga GROUP BY 1),
      prg AS (SELECT block_number // 100 AS block_bucket, action_type,
                CAST(LEAST(token_in_id, COALESCE(token_out_id, token_in_id)) AS VARCHAR)
                  || ':' ||
                CAST(GREATEST(token_in_id, COALESCE(token_out_id, token_in_id)) AS VARCHAR) AS e,
                CAST(COUNT(*) AS DOUBLE) AS v
              FROM actions WHERE token_in_id IS NOT NULL GROUP BY 1, 2, 3),
      prga AS (SELECT block_bucket, action_type,
                 (list(e ORDER BY v DESC, e DESC))[1] AS top_e, MAX(v) AS top_m
               FROM prg GROUP BY 1, 2),
      prgp AS (SELECT block_bucket, ${A5Categories.map { t =>
                 s"""MAX(CASE WHEN action_type = '$t' THEN top_e END) AS bpair_$t,
                 MAX(CASE WHEN action_type = '$t' THEN top_m END) AS bpair_v_$t"""
               }.mkString(",\n                 ")}
               FROM prga GROUP BY 1),
      mevc AS (
        SELECT DISTINCT front_tx AS tx_hash, 'sandwich' AS mev_type FROM sand
        UNION ALL SELECT DISTINCT tx_hash, 'jit' FROM jitp
        UNION ALL SELECT DISTINCT tx_hash, 'liquidation' FROM actions
          WHERE action_type = 'liquidation'
        UNION ALL SELECT DISTINCT tx_hash, 'arb' FROM arb
        UNION ALL SELECT tx_hash, 'cexdex'
          FROM (SELECT tx_hash FROM swaps GROUP BY 1 HAVING COUNT(*) = 1)),
      mevh AS (
        SELECT c.mev_type, h.block_number // 100 AS block_bucket,
          h.block_number, h.tx_hash, h.eoa, h.revenue_usd, h.gas_usd,
          h.profit_usd
        FROM mevc c JOIN header h ON c.tx_hash = h.tx_hash),
      mevagg AS (
        SELECT block_bucket, mev_type, COUNT(*) AS mn,
          ${sqlSum("revenue_usd")} AS mrev,
          ${sqlSumR("gas_usd")} AS mgas,
          ${sqlSumR("profit_usd")} AS mprofit,
          MAX(profit_usd) AS mmaxp, MIN(profit_usd) AS mminp,
          (list(eoa ORDER BY profit_usd DESC, tx_hash DESC, eoa DESC))[1]
            AS mtop,
          SUM(CASE WHEN revenue_usd <> 0 THEN 1 ELSE 0 END) AS mnm,
          ${sqlSumR("CASE WHEN revenue_usd <> 0 THEN profit_usd / revenue_usd END")}
            AS mmsum
        FROM mevh GROUP BY 1, 2),
      mevagg2 AS (
        SELECT *, mprofit / mn AS mavgp,
          CASE WHEN mnm > 0 THEN mmsum / mnm END AS mmargin
        FROM mevagg),
      mevneoa AS (SELECT block_bucket, mev_type,
          CAST(COUNT(DISTINCT eoa) AS BIGINT) AS mneoa
        FROM mevh GROUP BY 1, 2),
      mevnblk AS (SELECT block_bucket, mev_type,
          CAST(COUNT(DISTINCT block_number) AS BIGINT) AS mnblk
        FROM mevh GROUP BY 1, 2),
      mevp AS (SELECT g.block_bucket, ${A5MevTypes.map { t =>
          val is = s"g.mev_type = '$t'"
          s"""CAST(COALESCE(MAX(CASE WHEN $is THEN g.mn END), 0) AS BIGINT) AS mev_n_$t,
          CAST(COALESCE(MAX(CASE WHEN $is THEN e.mneoa END), 0) AS BIGINT) AS mev_neoa_$t,
          CAST(COALESCE(MAX(CASE WHEN $is THEN b.mnblk END), 0) AS BIGINT) AS mev_nblk_$t,
          MAX(CASE WHEN $is THEN g.mrev END) AS mev_rev_$t,
          MAX(CASE WHEN $is THEN g.mgas END) AS mev_gas_$t,
          MAX(CASE WHEN $is THEN g.mprofit END) AS mev_profit_$t,
          MAX(CASE WHEN $is THEN g.mmaxp END) AS mev_maxp_$t,
          MAX(CASE WHEN $is THEN g.mminp END) AS mev_minp_$t,
          MAX(CASE WHEN $is THEN g.mavgp END) AS mev_avgp_$t,
          MAX(CASE WHEN $is THEN g.mmargin END) AS mev_margin_$t,
          MAX(CASE WHEN $is THEN g.mtop END) AS mev_top_$t"""
        }.mkString(",\n          ")}
        FROM mevagg2 g
        LEFT JOIN mevneoa e
          ON g.block_bucket = e.block_bucket AND g.mev_type = e.mev_type
        LEFT JOIN mevnblk b
          ON g.block_bucket = b.block_bucket AND g.mev_type = b.mev_type
        GROUP BY 1),
      mtpoolmap AS (SELECT DISTINCT tx_hash, pool AS e
        FROM actions WHERE pool IS NOT NULL),
      mtpairmap AS (SELECT DISTINCT tx_hash,
          CAST(LEAST(token_in_id, COALESCE(token_out_id, token_in_id)) AS VARCHAR)
            || ':' ||
          CAST(GREATEST(token_in_id, COALESCE(token_out_id, token_in_id)) AS VARCHAR) AS e
        FROM actions WHERE token_in_id IS NOT NULL),
      mtdexmap AS (SELECT DISTINCT tx_hash, protocol AS e
        FROM actions WHERE pool IS NOT NULL),
      ${Seq(("mtpool", "mtpoolmap", "mt_pool"), ("mtpair", "mtpairmap", "mt_pair"),
          ("mtdex", "mtdexmap", "mt_dex")).map { case (cte, map, pfx) =>
        s"""${cte}_g AS (
        SELECT m.block_bucket, m.mev_type, t.e,
          ${sqlSumR("m.profit_usd")} AS vp, ${sqlSumR("m.revenue_usd")} AS vr
        FROM mevh m JOIN $map t ON t.tx_hash = m.tx_hash
        GROUP BY 1, 2, 3),
      ${cte}_a AS (
        SELECT block_bucket, mev_type,
          (list(e ORDER BY vp DESC, e DESC))[1] AS pe, MAX(vp) AS pv,
          (list(e ORDER BY vr DESC, e DESC))[1] AS re, MAX(vr) AS rv
        FROM ${cte}_g GROUP BY 1, 2),
      ${cte}_p AS (SELECT block_bucket, ${A5MevTypes.map { t =>
          s"""MAX(CASE WHEN mev_type = '$t' THEN pe END) AS ${pfx}_p_$t,
          MAX(CASE WHEN mev_type = '$t' THEN pv END) AS ${pfx}_p_v_$t,
          MAX(CASE WHEN mev_type = '$t' THEN re END) AS ${pfx}_r_$t,
          MAX(CASE WHEN mev_type = '$t' THEN rv END) AS ${pfx}_r_v_$t"""
        }.mkString(",\n          ")}
        FROM ${cte}_a GROUP BY 1)"""
      }.mkString(",\n      ")}
      SELECT r.*, ${A5Categories.map { t =>
        s"c.n_$t, c.ntx_$t, c.neoa_$t, c.npool_$t, c.in_$t, c.out_$t, " +
          s"c.maxin_$t, c.top_$t, c.toppool_$t, c.gas_$t, c.fee_$t"
      }.mkString(", ")},
        ${A5Categories.map { t =>
          s"e.topvol_$t, e.topvol_v_$t, f.topfund_$t, f.topfund_v_$t, " +
            s"p.bpool_$t, p.bpool_v_$t, pr.bpair_$t, pr.bpair_v_$t"
        }.mkString(", ")},
        ${A5MevTypes.map { t =>
          s"m.mev_n_$t, m.mev_neoa_$t, m.mev_nblk_$t, m.mev_rev_$t, " +
            s"m.mev_gas_$t, m.mev_profit_$t, m.mev_maxp_$t, m.mev_minp_$t, " +
            s"m.mev_avgp_$t, m.mev_margin_$t, m.mev_top_$t"
        }.mkString(", ")},
        ${A5MevTypes.flatMap { t =>
          Seq("mt_pool" -> "mtp", "mt_pair" -> "mtr", "mt_dex" -> "mtd").map {
            case (pfx, al) =>
              s"$al.${pfx}_p_$t, $al.${pfx}_p_v_$t, $al.${pfx}_r_$t, $al.${pfx}_r_v_$t"
          }
        }.mkString(", ")}
      FROM rollw r JOIN catw c USING (block_bucket)
      JOIN egp e USING (block_bucket)
      JOIN fgp f USING (block_bucket)
      LEFT JOIN pgp p USING (block_bucket)
      LEFT JOIN prgp pr USING (block_bucket)
      LEFT JOIN mevp m USING (block_bucket)
      LEFT JOIN mtpool_p mtp USING (block_bucket)
      LEFT JOIN mtpair_p mtr USING (block_bucket)
      LEFT JOIN mtdex_p mtd USING (block_bucket)
      ORDER BY block_bucket"""))

  /** F5: ABI decode registry — synthesized calldata (selector ‖ one 32-byte
    * word) decoded back: selector extraction, word count, argument-window
    * slicing; all in the hex-string domain both engines share. */
  private val f5AbiDecode = QueryDef(
    "f5_abi_decode",
    (s, dir) => tracesTable(s, dir)
      .withColumn("calldata_hex", concat(col("selector"),
        lpad(lower(hex(col("q6").cast("long"))), 64, "0")))
      .withColumn("dec_selector", substring(col("calldata_hex"), 1, 8))
      .withColumn("n_words", ((length(col("calldata_hex")) - 8) / 64).cast("long"))
      .withColumn("word0_tail", substring(col("calldata_hex"), 57, 16))
      .groupBy("dec_selector")
      .agg(count(lit(1)).as("n"),
        sum(col("n_words")).as("sum_words"),
        countDistinct(col("word0_tail")).as("n_distinct_words"),
        sum(when(col("dec_selector") === col("selector"), 1L).otherwise(0L))
          .as("n_roundtrip_ok"))
      .orderBy("dec_selector"),
    withCtes("""abi AS (
        SELECT selector,
          selector || lpad(lower(hex(CAST(q6 AS BIGINT))), 64, '0') AS calldata_hex
        FROM trace)
      SELECT substring(calldata_hex, 1, 8) AS dec_selector, COUNT(*) AS n,
        CAST(SUM((length(calldata_hex) - 8) // 64) AS BIGINT) AS sum_words,
        CAST(COUNT(DISTINCT substring(calldata_hex, 57, 16)) AS BIGINT) AS n_distinct_words,
        CAST(SUM(CASE WHEN substring(calldata_hex, 1, 8) = selector THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
      FROM abi GROUP BY 1 ORDER BY 1"""))

  /** F5 (native form): ABI decode over REAL BinaryType calldata via the
    * codegen'd Catalyst expressions [[graft.functions.AbiCalldata]] —
    * selector ‖ word0(q6) ‖ word1(p2) packed with unhex, decoded back with
    * `abi_selector`/`abi_word` (direct byte reads inside whole-stage
    * codegen; CodegenSpec pins no-fallback). The oracle computes the same
    * aggregates from the SOURCE columns, so the check is decode-vs-ground-
    * truth, not decode-vs-decode: any byte-layout bug breaks the match. */
  private val f5AbiDecodeBin = QueryDef(
    "f5_abi_decode_bin",
    (s, dir) => {
      import graft.functions.AbiCalldata._
      val word = (c: org.apache.spark.sql.Column) =>
        lpad(lower(hex(c.cast("long"))), 64, "0")
      tracesTable(s, dir)
        .withColumn("calldata",
          unhex(concat(col("selector"), word(col("q6")), word(col("p2")))))
        .withColumn("dec_selector", abi_selector(col("calldata")))
        .withColumn("w0", abi_word(col("calldata"), 0))
        .withColumn("w1", abi_word(col("calldata"), 1))
        .withColumn("w2", abi_word(col("calldata"), 2))
        .groupBy("dec_selector")
        .agg(count(lit(1)).as("n"),
          sum(col("w0")).as("sum_w0"),
          countDistinct(col("w1")).as("n_distinct_w1"),
          sum(when(col("w2").isNull, 1L).otherwise(0L)).as("n_w2_null"),
          sum(((length(col("calldata")) - 4) / 32).cast("long")).as("sum_words"),
          sum(when(col("dec_selector") === col("selector"), 1L).otherwise(0L))
            .as("n_roundtrip_ok"))
        .orderBy("dec_selector")
    },
    withCtes("""abi_gt AS (
        SELECT selector AS dec_selector, COUNT(*) AS n,
          CAST(SUM(q6) AS BIGINT) AS sum_w0,
          CAST(COUNT(DISTINCT p2) AS BIGINT) AS n_distinct_w1,
          COUNT(*) AS n_w2_null,
          2 * COUNT(*) AS sum_words,
          COUNT(*) AS n_roundtrip_ok
        FROM trace GROUP BY 1)
      SELECT * FROM abi_gt ORDER BY dec_selector"""))

  /** R3: pricer/tree rendezvous — a block is emittable only when both its
    * classified tree AND its DexQuotes exist; count matched vs deferred
    * (the WaitingForPricerFuture join keyed on block_number). */
  private val r3Rendezvous = QueryDef(
    "r3_rendezvous",
    (s, dir) => {
      // no persist: caching the full-width fact table costs more than the
      // two PRUNED columnar scans it would save, and measurably turns
      // super-linear at 10x data (sf1 rehearsal r10: 11.0x -> linear)
      val a = actionsTable(s, dir)
      val treeReady = a.groupBy("block_number").agg(count(lit(1)).as("n_actions"))
      val quotesReady = a.filter(col("action_type") === "swap" &&
          col("amount_in").isNotNull && col("amount_out").isNotNull)
        .groupBy(col("block_number").as("q_block"))
        .agg(count(lit(1)).as("n_quotes"))
      treeReady.join(quotesReady, col("block_number") === col("q_block"), "left")
        .withColumn("state", when(col("q_block").isNotNull, "ready").otherwise("no_pricing"))
        .groupBy("state")
        .agg(count(lit(1)).as("n_blocks"), sum(col("n_actions")).as("n_actions"))
        .orderBy("state")
    },
    withCtes("""tree_r AS (SELECT block_number, COUNT(*) AS n_actions
        FROM actions GROUP BY 1),
      quotes_r AS (SELECT block_number, COUNT(*) AS n_quotes FROM actions
        WHERE action_type = 'swap' AND amount_in IS NOT NULL AND amount_out IS NOT NULL
        GROUP BY 1)
      SELECT CASE WHEN q.block_number IS NOT NULL THEN 'ready'
                  ELSE 'no_pricing' END AS state,
        COUNT(*) AS n_blocks, CAST(SUM(t.n_actions) AS BIGINT) AS n_actions
      FROM tree_r t LEFT JOIN quotes_r q ON t.block_number = q.block_number
      GROUP BY 1 ORDER BY 1"""))

  /** Q6: JIT-cex-dex — JIT brackets whose maker EOA also has a cex-dex
    * markout edge in the same block (jit/jit_cex_dex.rs composition). */
  private val q6JitCexDex = QueryDef(
    "q6_jit_cex_dex",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("block_number", "from_address", "pool")
        .orderBy("tx_idx", "trace_idx")
      val jitp = actionsTable(s, dir)
        .filter(col("action_type").isin("mint", "burn") && col("pool").isNotNull)
        .withColumn("nxt", lead(col("action_type"), 1).over(w))
        .filter(col("action_type") === "mint" && col("nxt") === "burn")
        .select(col("block_number"), col("from_address").as("eoa"))
        .distinct()
      val cexLegs = actionsTable(s, dir)
        .filter(col("action_type") === "swap" &&
          col("amount_in").isNotNull && col("amount_out").isNotNull)
        .select(col("block_number").as("c_block"), col("from_address").as("c_eoa"))
        .distinct()
      jitp.join(cexLegs, col("block_number") === col("c_block") &&
          col("eoa") === col("c_eoa"))
        .agg(count(lit(1)).as("n_jit_cexdex"),
          countDistinct(col("block_number")).as("n_blocks"),
          countDistinct(col("eoa")).as("n_eoas"))
    },
    withCtes(s"""jitp6 AS (
        SELECT DISTINCT block_number, eoa FROM (
          SELECT block_number, from_address AS eoa, pool, action_type,
            LEAD(action_type) OVER w AS nxt
          FROM actions WHERE action_type IN ('mint','burn') AND pool IS NOT NULL
          WINDOW w AS (PARTITION BY block_number, from_address, pool
                       ORDER BY tx_idx, trace_idx))
        WHERE action_type = 'mint' AND nxt = 'burn'),
      cexl AS (
        SELECT DISTINCT block_number, from_address AS eoa FROM actions
        WHERE action_type = 'swap' AND amount_in IS NOT NULL AND amount_out IS NOT NULL)
      SELECT COUNT(*) AS n_jit_cexdex,
        CAST(COUNT(DISTINCT j.block_number) AS BIGINT) AS n_blocks,
        CAST(COUNT(DISTINCT j.eoa) AS BIGINT) AS n_eoas
      FROM jitp6 j JOIN cexl c ON j.block_number = c.block_number AND j.eoa = c.eoa"""))
}
