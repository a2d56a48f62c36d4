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
  *   J9 trigger-tx search  atomic_arb.rs:239-311 (2-block walk)
  *   J10 MEV dedup         composer/mod.rs:190-231
  *   J11 JitSandwich       composer/composer_filters.rs:20-48
  *   W3 bounded shrink     sandwich/mod.rs:447-555
  *
  * Scale shape: every candidate join is EQUI-keyed on the 2-block window id
  * `wnd` (plus eoa/pool where the pattern allows) — the reference's
  * per-block-window scan becomes a shuffle partitioned by block-grained
  * keys, so a 100 TB backfill parallelizes by block with at most a 2×
  * row expansion and no other cross-block data motion. PnL joins the A3
  * header built in [[Accounting]].
  */
object InspectorOps extends QueryModule {

  import Accounting._
  import ChainFixture._

  def defs: Seq[QueryDef] = Seq(a3BundleHeader, q7Liquidations, q2AtomicArb,
    q8SearcherActivity, q1Sandwich, q5Jit, j7PoolOverlap, j8JitBracket,
    j9TriggerDomain, j10ComposerDedup, j10BundleDedup, j11JitSandwich,
    q9MevBlock, w3ShrinkLoop, q2ArbTree, q2RequirementArms, j6BracketW3,
    a1DeltaDecimal, q7LiqBundles, q8SearcherTx, q9PossibleMev, q9BuilderPnl,
    q9MevCount, j11Composed)

  private def withCtes(sql: String) = Some(s"WITH $sqlDomainCtes, $sql")

  /** Inspectors see the current block plus the previous one — the
    * reference's `block_window() = 2` (atomic_arb.rs:41-43,
    * multi_block.rs:6-33). Boundary-straddling MEV stays visible. */
  val BlockWindow = 2

  /** sandwich/mod.rs:36 MAX_PRICE_DIFF: a leg whose effective rate deviates
    * from dex pricing by more than 99.5% is price-manipulated noise. */
  val MaxPriceDiff = 0.995

  /** sandwich/mod.rs:696-701: the fraction of grouped between-txs that must
    * actually overlap the bracket. The comment there says 50%, the shipped
    * constant is `victim_pct >= 0.25` — we mirror the code. Kept as a
    * rational (1/4) so the check stays in exact integer arithmetic. */
  val MinVictimRatioDen = 4

  /** Shrink recursion bound (sandwich/mod.rs:474: `recursive >= 6`). */
  val ShrinkRounds = 6

  // ── shared Spark fragments ────────────────────────────────────────────────

  private def swaps(s: SparkSession, dir: String): DataFrame =
    swapsOf(actionsTable(s, dir))

  /** The swap slice of any actions-shaped frame (tip mode classifies a
    * micro-batch and feeds this same filter). */
  private[graft] def swapsOf(actionsDf: DataFrame): DataFrame =
    actionsDf.filter(col("action_type") === "swap" &&
      col("amount_in").isNotNull && col("amount_out").isNotNull)

  /** Per-(tx, pool) swap rollup — the sandwich candidate unit,
    * parameterized over any swaps-shaped frame. */
  private[graft] def swTxFromSwaps(swapsDf: DataFrame): DataFrame =
    swapsDf.filter(col("pool").isNotNull)
      .groupBy("block_number", "tx_idx", "tx_hash", "from_address", "pool")
      .agg(min_by(col("direction"), col("trace_idx")).as("dir"),
        min_by(col("token_in_id"), col("trace_idx")).as("tok_in"),
        min_by(col("token_out_id"), col("trace_idx")).as("tok_out"),
        dsum(col("amount_in")).as("sum_in"),
        dsum(col("amount_out")).as("sum_out"))
      .withColumnRenamed("from_address", "eoa")

  /** Materialized [[swTxFromSwaps]] — six queries (q1/q5/j7/j10/j11/w3)
    * read it, like the other pipeline intermediates. */
  private def swTx(s: SparkSession, dir: String): DataFrame =
    ChainFixture.materialize(s, s"swtx_${ChainFixture.dirKey(dir)}",
      swTxFromSwaps(swaps(s, dir)))

  /** Expand a (block_number, tx_idx)-keyed frame into `w`-block sliding
    * windows: each row lands in window keys {block .. block+w-1}, so
    * window `wnd` sees blocks {wnd-w+1 .. wnd}. The reference makes the
    * window a per-inspector declaration (`block_window()`,
    * brontes-inspect/src/lib.rs:94; multi_block.rs:6-33) — parameterized
    * here the same way, defaulting to [[BlockWindow]]. `ord` is the
    * global tx order (tx_idx < TxPerBlock by construction). Rows expand
    * ×w, but every downstream join stays equi-keyed on the block-grained
    * `wnd`. */
  private[graft] def windowed(df: DataFrame, w: Int = BlockWindow): DataFrame =
    df.withColumn("ord", col("block_number") * TxPerBlock + col("tx_idx"))
      .withColumn("wnd", explode(sequence(col("block_number"),
        col("block_number") + (w - 1))))

  /** J6 bracket over the 2-block window: consecutive opposite-direction
    * same-pool txs by one EOA, where "consecutive" is evaluated inside each
    * 2-block window. A pair fully inside block b appears in windows b and
    * b+1; a boundary pair (front in b-1, back in b) only in window b —
    * emitting a pair only from the window that equals its BACK block makes
    * each bracket appear exactly once. Carries `valid_pricing`
    * (MAX_PRICE_DIFF sanity on both legs against the fixture price dim). */
  private[graft] def bracketsOf(swTxDf: DataFrame,
      blockWindow: Int = BlockWindow): DataFrame = {
    val w = Window.partitionBy("wnd", "eoa", "pool").orderBy("ord")
    def px(t: Column): Column = tokenPrice(t)
    windowed(swTxDf, blockWindow)
      .withColumn("back_block", lead(col("block_number"), 1).over(w))
      .withColumn("back_ord", lead(col("ord"), 1).over(w))
      .withColumn("back_dir", lead(col("dir"), 1).over(w))
      .withColumn("back_tok_in", lead(col("tok_in"), 1).over(w))
      .withColumn("back_tok_out", lead(col("tok_out"), 1).over(w))
      .withColumn("back_in", lead(col("sum_in"), 1).over(w))
      .withColumn("back_out", lead(col("sum_out"), 1).over(w))
      .withColumn("back_tx", lead(col("tx_hash"), 1).over(w))
      .filter(col("back_ord").isNotNull && col("dir") =!= col("back_dir") &&
        col("back_block") === col("wnd"))
      .withColumn("valid_pricing",
        abs((col("sum_out") / col("sum_in")) /
          (px(col("tok_in")) / px(col("tok_out"))) - 1) <= MaxPriceDiff &&
        abs((col("back_out") / col("back_in")) /
          (px(col("back_tok_in")) / px(col("back_tok_out"))) - 1) <= MaxPriceDiff)
      .select(col("wnd"), col("block_number").as("front_block"), col("back_block"),
        col("eoa"), col("pool"), col("tx_idx").as("front_idx"),
        col("ord").as("front_ord"), col("tx_hash").as("front_tx"),
        col("dir"), col("tok_in"), col("tok_out"), col("sum_in"), col("sum_out"),
        col("back_ord"), col("back_in"), col("back_out"), col("back_tx"),
        col("valid_pricing"))
  }

  /** The swap-tx rollup + its oracle CTE, shared with [[BigMacOps]]. */
  private[domain] def swTxOf(s: SparkSession, dir: String): DataFrame =
    swTx(s, dir)
  private[domain] def swTxCteShared: String = swTxCte

  /** Brackets are scanned by j6/j10/j11 — materialized like the other
    * pipeline intermediates so the window over swTx runs once per JVM. */
  private def brackets(s: SparkSession, dir: String): DataFrame =
    ChainFixture.materialize(s, s"brkt_${ChainFixture.dirKey(dir)}",
      bracketsOf(swTx(s, dir)))

  /** Victim stats for bracket-shaped candidates: `n_cand_txs` = distinct
    * other-EOA swap txs strictly between the bracket boundaries (the
    * reference's grouped victims, sandwich/mod.rs:617-701), `n_victims` =
    * those that overlap the bracket's pool in the same direction. Equi-keyed
    * on `wnd` — block-local work. */
  private[graft] def victimStats(cand: DataFrame, swTxW: DataFrame): DataFrame = {
    val v = swTxW.select(col("wnd").as("v_wnd"), col("pool").as("v_pool"),
      col("ord").as("v_ord"), col("eoa").as("v_eoa"), col("dir").as("v_dir"),
      col("tx_hash").as("v_tx"))
    cand.join(v, col("v_wnd") === col("wnd") && col("v_eoa") =!= col("eoa") &&
        col("v_ord") > col("front_ord") && col("v_ord") < col("back_ord"), "left")
      .groupBy(cand.columns.toIndexedSeq.map(col): _*)
      .agg(countDistinct(when(col("v_pool") === col("pool") &&
          col("v_dir") === col("dir"), col("v_tx"))).as("n_victims"),
        countDistinct(col("v_tx")).as("n_cand_txs"))
  }

  /** verify_sandwich_victims (mod.rs:617-701): ≥1 true victim and at least
    * 1/[[MinVictimRatioDen]] of the between-txs victimized, with sane
    * pricing. Integer arithmetic → exact on both engines. */
  private def verified: Column =
    col("n_victims") >= 1 &&
      col("n_victims") * MinVictimRatioDen >= col("n_cand_txs") &&
      col("valid_pricing")

  /** Verified sandwiches via the reference-exact shrink recursion
    * (`recursive_possible_sandwiches`, mod.rs:447-555), sharing
    * [[BigMacOps.shrinkEmitExpr]] — ONE shrink implementation for both
    * sandwich surfaces. Per (wnd, eoa, pool), the EOA's swap txs form a
    * chain of positions 1..n (links 1..m = n−1); a candidate range [i,j]
    * is the sandwich (front = position i, back = position j+1), so the
    * back-shrink POPS the last frontrun and promotes it to backrun and a
    * shrunk sandwich's boundary is always a REAL tx (this retires the
    * halved-`back_ord` divergence the previous loop documented). A range
    * verifies iff its boundary legs alternate direction with sane pricing
    * and the strictly-between victim set passes the ≥ 1 and
    * ≥ 1/[[MinVictimRatioDen]] checks (mod.rs:617-701); a failing range of
    * ≥ 2 links spawns its front/back drops; emission requires verification
    * plus an all-failing shrink path within [[ShrinkRounds]] drops
    * (mod.rs:461-464). `found_at_iter` is the recursion depth (total
    * drops, 0 = no shrink). Pairs fully inside one block appear in two
    * windows — only the window equal to the back's block emits, as in
    * [[bracketsOf]]. */
  private[graft] def sandwichesOf(swTxDf: DataFrame): DataFrame = {
    def px(t: Column): Column = tokenPrice(t)
    val swW = windowed(swTxDf)
    val wC = Window.partitionBy("wnd", "eoa", "pool")
    val pos = swW
      .withColumn("pos", row_number().over(wC.orderBy("ord")))
      .withColumn("np", count(lit(1)).over(wC))
      .filter(col("np") >= 2)
    val f = pos.select(col("wnd"), col("eoa"), col("pool"),
      (col("np") - 1).cast("int").as("m"), col("pos").cast("int").as("i"),
      col("block_number").as("front_block"), col("tx_idx").as("front_idx"),
      col("ord").as("front_ord"), col("tx_hash").as("front_tx"),
      col("dir"), col("tok_in"), col("tok_out"), col("sum_in"), col("sum_out"))
    val b = pos.select(col("wnd").as("b_wnd"), col("eoa").as("b_eoa"),
      col("pool").as("b_pool"), (col("pos") - 1).cast("int").as("j"),
      col("block_number").as("back_block"), col("ord").as("back_ord"),
      col("dir").as("back_dir"),
      col("tok_in").as("back_tok_in"), col("tok_out").as("back_tok_out"),
      col("sum_in").as("back_in"), col("sum_out").as("back_out"),
      col("tx_hash").as("back_tx"))
    val cand = f.join(b,
        col("b_wnd") === col("wnd") && col("b_eoa") === col("eoa") &&
          col("b_pool") === col("pool") && col("j") >= col("i") &&
          (col("i") - 1) + (col("m") - col("j")) <= ShrinkRounds)
      .drop("b_wnd", "b_eoa", "b_pool")
      .withColumn("valid_pricing",
        abs((col("sum_out") / col("sum_in")) /
          (px(col("tok_in")) / px(col("tok_out"))) - 1) <= MaxPriceDiff &&
        abs((col("back_out") / col("back_in")) /
          (px(col("back_tok_in")) / px(col("back_tok_out"))) - 1) <= MaxPriceDiff)
    val verd = victimStats(cand, swW)
      .withColumn("ok", verified && col("dir") =!= col("back_dir"))
      .localCheckpoint()
    val emit = verd.groupBy("wnd", "eoa", "pool")
      .agg(collect_list(struct(col("i"), col("j"), col("m"), col("ok"))).as("rs"))
      .select(col("wnd").as("e_wnd"), col("eoa").as("e_eoa"),
        col("pool").as("e_pool"),
        explode(expr(BigMacOps.shrinkEmitExpr(ShrinkRounds))).as("r"))
    verd.join(emit, col("e_wnd") === col("wnd") && col("e_eoa") === col("eoa") &&
        col("e_pool") === col("pool") && col("r.i") === col("i") &&
        col("r.j") === col("j"))
      .filter(col("back_block") === col("wnd"))
      .withColumn("found_at_iter",
        ((col("i") - 1) + (col("m") - col("j"))).cast("int"))
      .drop("e_wnd", "e_eoa", "e_pool", "r", "i", "j", "m",
        "back_dir", "back_tok_in", "back_tok_out", "ok")
  }

  /** The verified sandwich set, computed once per JVM (q1/j10/q9/w3 all
    * read it — the reference persists its bundles the same way). */
  private[domain] def sandwiches(s: SparkSession, dir: String): DataFrame =
    ChainFixture.materialize(s, s"sand_${ChainFixture.dirKey(dir)}",
      sandwichesOf(swTx(s, dir)))

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

  /** Materialized like swTx/sandwiches/jitPairs: NINE consumers (q9 family,
    * j10/j11, q8, the fidelity candidate union) each re-ran the per-tx
    * window + aggregate over the swaps fact; the store makes that one pass
    * per JVM and every consumer a tiny-table read. */
  private[domain] def arbs(s: SparkSession, dir: String): DataFrame =
    ChainFixture.materialize(s, s"arbs_${ChainFixture.dirKey(dir)}",
      arbsOf(swaps(s, dir)))

  /** The reference's EXACT arb-type decision tree (is_possible_arb
    * atomic_arb.rs:314-339 + identify_arb_sequence :398-422), replacing the
    * structural leg-count heuristic: candidates need only ≥2 swaps — no
    * continuity or cyclicity precondition — and classify as
    *   2 legs: cyclic∧continuous → triangle; cyclic∧stable(out0,in1) →
    *     stablecoin; cyclic → cross_pair(1); stable(first_in,last_out) →
    *     stablecoin; else long_tail.
    *   ≥3 legs: non-cyclic → stablecoin if stable endpoints else long_tail;
    *     cyclic → cross_pair(first discontinuity index) else triangle.
    * `is_stable` is the fixture's token_id < 5 membership (f4's class). */
  private[graft] def arbTreeOf(swapsDf: DataFrame): DataFrame = {
    val w = Window.partitionBy("tx_hash").orderBy("trace_idx")
    def stable(c: Column): Column = c < 5
    swapsDf
      .withColumn("p_out", lag(col("token_out_id"), 1).over(w))
      .withColumn("leg_pos", row_number().over(w))
      .groupBy("tx_hash")
      .agg(count(lit(1)).as("n_swaps"),
        min_by(col("token_in_id"), col("trace_idx")).as("first_in"),
        max_by(col("token_out_id"), col("trace_idx")).as("last_out"),
        min_by(col("token_out_id"), col("trace_idx")).as("out0"),
        max_by(col("token_in_id"), col("trace_idx")).as("in_last"),
        min(when(col("p_out").isNotNull && col("p_out") =!= col("token_in_id"),
          col("leg_pos") - 1)).as("jump"))
      .filter(col("n_swaps") >= 2)
      .withColumn("cyclic", col("first_in") === col("last_out"))
      .withColumn("continuous", col("jump").isNull)
      .withColumn("arb_type",
        when(col("n_swaps") === 2,
          when(col("cyclic") && col("continuous"), "triangle")
            .when(col("cyclic") && stable(col("out0")) && stable(col("in_last")),
              "stablecoin")
            .when(col("cyclic"), "cross_pair")
            .when(stable(col("first_in")) && stable(col("last_out")), "stablecoin")
            .otherwise("long_tail"))
          .otherwise(
            when(!col("cyclic"),
              when(stable(col("first_in")) && stable(col("last_out")), "stablecoin")
                .otherwise("long_tail"))
              .when(col("jump").isNotNull, "cross_pair")
              .otherwise("triangle")))
      .withColumn("jump_index",
        when(col("arb_type") === "cross_pair",
          when(col("n_swaps") === 2, lit(1L)).otherwise(col("jump"))))
  }

  /** Q2 (domain form): the arb-type tree rolled up per type. */
  private val q2ArbTree = QueryDef(
    "q2_arb_tree",
    (s, dir) => arbTreeOf(swaps(s, dir))
      .groupBy("arb_type")
      .agg(count(lit(1)).as("n_txs"),
        sum(col("n_swaps")).as("n_legs"),
        sum(when(col("cyclic"), 1L).otherwise(0L)).as("n_cyclic"),
        max(col("jump_index")).as("max_jump"))
      .orderBy("arb_type"),
    withCtes(s"""legs_t AS (
        SELECT tx_hash, trace_idx, token_in_id, token_out_id,
          LAG(token_out_id) OVER w AS p_out,
          ROW_NUMBER() OVER w AS leg_pos
        FROM swaps WINDOW w AS (PARTITION BY tx_hash ORDER BY trace_idx)),
      cand_t AS (
        SELECT tx_hash, COUNT(*) AS n_swaps,
          ARG_MIN(token_in_id, trace_idx) AS first_in,
          ARG_MAX(token_out_id, trace_idx) AS last_out,
          ARG_MIN(token_out_id, trace_idx) AS out0,
          ARG_MAX(token_in_id, trace_idx) AS in_last,
          MIN(CASE WHEN p_out IS NOT NULL AND p_out <> token_in_id
                   THEN leg_pos - 1 END) AS jump
        FROM legs_t GROUP BY 1 HAVING COUNT(*) >= 2),
      typed_t AS (
        SELECT *, first_in = last_out AS cyclic, jump IS NULL AS continuous,
          CASE WHEN n_swaps = 2 THEN
            CASE WHEN first_in = last_out AND jump IS NULL THEN 'triangle'
                 WHEN first_in = last_out AND out0 < 5 AND in_last < 5 THEN 'stablecoin'
                 WHEN first_in = last_out THEN 'cross_pair'
                 WHEN first_in < 5 AND last_out < 5 THEN 'stablecoin'
                 ELSE 'long_tail' END
          ELSE
            CASE WHEN first_in <> last_out THEN
                   CASE WHEN first_in < 5 AND last_out < 5 THEN 'stablecoin'
                        ELSE 'long_tail' END
                 WHEN jump IS NOT NULL THEN 'cross_pair'
                 ELSE 'triangle' END
          END AS arb_type
        FROM cand_t)
      SELECT arb_type, COUNT(*) AS n_txs,
        CAST(SUM(n_swaps) AS BIGINT) AS n_legs,
        CAST(SUM(CASE WHEN cyclic THEN 1 ELSE 0 END) AS BIGINT) AS n_cyclic,
        MAX(CASE WHEN arb_type = 'cross_pair' THEN
          CASE WHEN n_swaps = 2 THEN 1 ELSE jump END END) AS max_jump
      FROM typed_t GROUP BY 1 ORDER BY 1"""))

  // ── the per-type requirement LADDER (atomic_arb.rs:173-198) ─────────────

  /** Profit clamp bounds (the reference's MAX_PROFIT/MIN_PROFIT, scaled to
    * the fixture's per-tx PnL range): outside them the price data is
    * distrusted — profit zeroes and has_dex_price drops, DOUBLING every
    * count bar (requirement_multiplier 1→2). */
  private val ClampMaxUsd = 250000.0
  private val ClampMinUsd = -250000.0
  /** A tx is "private order-flow" when its root frame pays ≤ this public
    * tip (fixture analog of TxInfo::is_private; priority_fee ∈ 1..~101). */
  private val PrivateTipBar = 10L
  /** Searcher bundle-count bars (atomic_arb.rs: 20·mult triangle/cross/
    * stable, 100·mult long-tail). The fixture's EOA rotation spreads typed
    * arbs near-uniformly (~221..241 per EOA at sf0.01), so the reference's
    * literals would be all-true; the bars scale to ≈p50 / ≈p85 of that
    * distribution, preserving the semantics — long-tail demands a much
    * stronger searcher history — with both sides of each bar populated.
    * The ×2 clamp multiplier pushes either bar past every EOA, so a
    * distrusted price genuinely disables the count arm. */
  private val CountBarMain = 232L
  private val CountBarLongTail = 240L

  /** Q2 (validity form): the reference's per-type requirement arms — the
    * decision LADDER that turns a typed candidate into an accepted arb
    * (atomic_arb.rs:173-198), with every signal a fixture analog:
    *   - profit clamp: |profit| beyond the bounds → profit := 0,
    *     has_dex_price := false, count bars double (requirement_multiplier);
    *   - searcher count: the EOA's typed-arb bundle count (the reference's
    *     is_searcher_of_type_with_count_threshold over its searcher DB);
    *   - labelled: the J1 searcher dimension (EOAs 0..3);
    *   - private: root frame public tip ≤ [[PrivateTipBar]];
    *   - coinbase transfer: the tx carries a builder-payment root frame;
    *   - mev_contract: root frame targets a known pool contract.
    * Arms per type (∥ = OR):
    *   triangle    valid ⟺ profitable ∥ count≥20·m ∥ labelled ∥ (coinbase ∧ private)
    *   cross_pair  valid ⟺ profitable ∥ stable-jump ∥ count≥20·m ∥ labelled ∥ private ∥ coinbase
    *   stablecoin  valid ⟺ profitable ∥ count≥20·m ∥ labelled ∥ private ∥ coinbase
    *   long_tail   valid ⟺ longtail-arm ∧ (profitable ∥ ¬has_dex_price),
    *     longtail-arm = count≥100·m ∥ labelled ∥ (private ∧ coinbase) ∥ mev_contract
    * Output: one row per type with the population each arm passes — so the
    * oracle checks the whole ladder, not just the final verdict. */
  private val q2RequirementArms = QueryDef(
    "q2_requirement_arms",
    (s, dir) => {
      val sw = swaps(s, dir)
      val typed = arbTreeOf(sw).select("tx_hash", "arb_type", "n_swaps")
      // stable-jump: is_stable_pair at the FIRST discontinuity leg
      // (token_bought = previous leg's out, token_sold = this leg's in)
      val w = Window.partitionBy("tx_hash").orderBy("trace_idx")
      val jumpStable = sw
        .withColumn("p_out", lag(col("token_out_id"), 1).over(w))
        .withColumn("leg_pos", row_number().over(w))
        .filter(col("p_out").isNotNull && col("p_out") =!= col("token_in_id"))
        .groupBy("tx_hash")
        .agg(min_by(col("p_out") < 5 && col("token_in_id") < 5, col("leg_pos"))
          .as("jump_stable"))
      val roots = tracesTable(s, dir).filter(col("trace_idx") === 1)
        .select(col("tx_hash"),
          (col("priority_fee") <= PrivateTipBar).as("is_private"),
          (col("to_address") ===
            md5(concat(lit("builder:"), col("block_number") % NumBuilders)))
            .as("coinbase"),
          col("to_address"))
      val poolDim = pools(s).select(col("address").as("p_addr"))
      val sig = roots.join(broadcast(poolDim),
          col("to_address") === col("p_addr"), "left")
        .select(col("tx_hash"), col("is_private"), col("coinbase"),
          col("p_addr").isNotNull.as("mev_contract"))
      val hdr = bundleHeaders(s, dir).select("tx_hash", "eoa", "profit_usd")
      val base = typed.join(hdr, "tx_hash")
      val eoaCounts = base.groupBy("eoa").agg(count(lit(1)).as("s_count"))
      val lbl = ChainFixture.searchers(s)
      val armed = base
        .join(broadcast(eoaCounts), "eoa")
        .join(broadcast(lbl), col("eoa") === col("s_eoa"), "left")
        .join(sig, "tx_hash")
        .join(jumpStable, Seq("tx_hash"), "left")
        .withColumn("has_dex_price",
          col("profit_usd") < ClampMaxUsd && col("profit_usd") > ClampMinUsd)
        .withColumn("profit", when(col("has_dex_price"), col("profit_usd"))
          .otherwise(lit(0.0)))
        .withColumn("mult", when(col("has_dex_price"), 1L).otherwise(2L))
        .withColumn("profitable", col("profit") > 0)
        .withColumn("labelled", col("s_eoa").isNotNull)
        .withColumn("cnt_main", col("s_count") >= col("mult") * CountBarMain)
        .withColumn("cnt_lt", col("s_count") >= col("mult") * CountBarLongTail)
        .withColumn("is_valid",
          when(col("arb_type") === "triangle", col("profitable") ||
            col("cnt_main") || col("labelled") ||
            (col("coinbase") && col("is_private")))
          .when(col("arb_type") === "cross_pair", col("profitable") ||
            coalesce(col("jump_stable"), lit(false)) || col("cnt_main") ||
            col("labelled") || col("is_private") || col("coinbase"))
          .when(col("arb_type") === "stablecoin", col("profitable") ||
            col("cnt_main") || col("labelled") || col("is_private") ||
            col("coinbase"))
          .otherwise((col("cnt_lt") || col("labelled") ||
            (col("is_private") && col("coinbase")) || col("mev_contract")) &&
            (col("profitable") || !col("has_dex_price"))))
      armed.groupBy("arb_type")
        .agg(count(lit(1)).as("n_arbs"),
          sum(when(col("is_valid"), 1L).otherwise(0L)).as("n_valid"),
          sum(when(col("profitable"), 1L).otherwise(0L)).as("n_profitable"),
          sum(when(!col("has_dex_price"), 1L).otherwise(0L)).as("n_clamped"),
          sum(when(col("labelled"), 1L).otherwise(0L)).as("n_labelled"),
          sum(when(col("is_private"), 1L).otherwise(0L)).as("n_private"),
          sum(when(col("coinbase"), 1L).otherwise(0L)).as("n_coinbase"),
          sum(when(col("mev_contract"), 1L).otherwise(0L)).as("n_mev_contract"),
          sum(when(col("cnt_main"), 1L).otherwise(0L)).as("n_count_main"),
          dsumR(when(col("is_valid"), col("profit")).otherwise(lit(0.0)))
            .as("sum_profit_kept"))
        .orderBy("arb_type")
    },
    withCtes(s"""legs_v AS (
        SELECT tx_hash, trace_idx, token_in_id, token_out_id,
          LAG(token_out_id) OVER w AS p_out,
          ROW_NUMBER() OVER w AS leg_pos
        FROM swaps WINDOW w AS (PARTITION BY tx_hash ORDER BY trace_idx)),
      typed_v AS (
        SELECT tx_hash,
          CASE WHEN n_swaps = 2 THEN
            CASE WHEN first_in = last_out AND jump IS NULL THEN 'triangle'
                 WHEN first_in = last_out AND out0 < 5 AND in_last < 5 THEN 'stablecoin'
                 WHEN first_in = last_out THEN 'cross_pair'
                 WHEN first_in < 5 AND last_out < 5 THEN 'stablecoin'
                 ELSE 'long_tail' END
          ELSE
            CASE WHEN first_in <> last_out THEN
                   CASE WHEN first_in < 5 AND last_out < 5 THEN 'stablecoin'
                        ELSE 'long_tail' END
                 WHEN jump IS NOT NULL THEN 'cross_pair'
                 ELSE 'triangle' END
          END AS arb_type
        FROM (
          SELECT tx_hash, COUNT(*) AS n_swaps,
            ARG_MIN(token_in_id, trace_idx) AS first_in,
            ARG_MAX(token_out_id, trace_idx) AS last_out,
            ARG_MIN(token_out_id, trace_idx) AS out0,
            ARG_MAX(token_in_id, trace_idx) AS in_last,
            MIN(CASE WHEN p_out IS NOT NULL AND p_out <> token_in_id
                     THEN leg_pos - 1 END) AS jump
          FROM legs_v GROUP BY 1 HAVING COUNT(*) >= 2)),
      jstab AS (
        SELECT tx_hash,
          ARG_MIN(p_out < 5 AND token_in_id < 5, leg_pos) AS jump_stable
        FROM legs_v
        WHERE p_out IS NOT NULL AND p_out <> token_in_id
        GROUP BY 1),
      roots_v AS (
        SELECT t.tx_hash, t.priority_fee <= $PrivateTipBar AS is_private,
          t.to_address = md5('builder:' || t.block_number % $NumBuilders)
            AS coinbase,
          p.address IS NOT NULL AS mev_contract
        FROM trace t
        LEFT JOIN pool p ON t.to_address = p.address
        WHERE t.trace_idx = 1),
      base_v AS (
        SELECT ty.tx_hash, ty.arb_type, h.eoa, h.profit_usd
        FROM typed_v ty JOIN header h ON ty.tx_hash = h.tx_hash),
      ecnt AS (SELECT eoa, COUNT(*) AS s_count FROM base_v GROUP BY 1),
      lblv AS $searchersCteBody,
      armed AS (
        SELECT b.*, c.s_count, l.s_eoa IS NOT NULL AS labelled,
          r.is_private, r.coinbase, r.mev_contract,
          COALESCE(j.jump_stable, false) AS jump_stable,
          b.profit_usd < $ClampMaxUsd AND b.profit_usd > $ClampMinUsd
            AS has_dex_price
        FROM base_v b
        JOIN ecnt c ON b.eoa = c.eoa
        LEFT JOIN lblv l ON b.eoa = l.s_eoa
        JOIN roots_v r ON b.tx_hash = r.tx_hash
        LEFT JOIN jstab j ON b.tx_hash = j.tx_hash),
      armed2 AS (
        SELECT *,
          CASE WHEN has_dex_price THEN profit_usd ELSE 0.0 END AS profit,
          CASE WHEN has_dex_price THEN 1 ELSE 2 END AS mult
        FROM armed),
      armed3 AS (
        SELECT *,
          profit > 0 AS profitable,
          s_count >= $CountBarMain * mult AS cnt_main,
          s_count >= $CountBarLongTail * mult AS cnt_lt
        FROM armed2),
      verdict AS (
        SELECT *,
          CASE arb_type
            WHEN 'triangle' THEN profitable OR cnt_main OR labelled
              OR (coinbase AND is_private)
            WHEN 'cross_pair' THEN profitable OR jump_stable OR cnt_main
              OR labelled OR is_private OR coinbase
            WHEN 'stablecoin' THEN profitable OR cnt_main OR labelled
              OR is_private OR coinbase
            ELSE (cnt_lt OR labelled OR (is_private AND coinbase)
              OR mev_contract) AND (profitable OR NOT has_dex_price)
          END AS is_valid
        FROM armed3)
      SELECT arb_type, COUNT(*) AS n_arbs,
        CAST(SUM(CASE WHEN is_valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        CAST(SUM(CASE WHEN profitable THEN 1 ELSE 0 END) AS BIGINT) AS n_profitable,
        CAST(SUM(CASE WHEN NOT has_dex_price THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
        CAST(SUM(CASE WHEN labelled THEN 1 ELSE 0 END) AS BIGINT) AS n_labelled,
        CAST(SUM(CASE WHEN is_private THEN 1 ELSE 0 END) AS BIGINT) AS n_private,
        CAST(SUM(CASE WHEN coinbase THEN 1 ELSE 0 END) AS BIGINT) AS n_coinbase,
        CAST(SUM(CASE WHEN mev_contract THEN 1 ELSE 0 END) AS BIGINT) AS n_mev_contract,
        CAST(SUM(CASE WHEN cnt_main THEN 1 ELSE 0 END) AS BIGINT) AS n_count_main,
        ${sqlSumR("CASE WHEN is_valid THEN profit ELSE 0.0 END")} AS sum_profit_kept
      FROM verdict GROUP BY 1 ORDER BY 1"""))

  /** Distinct swap-leg candidate set (block, tx, pool, direction) — the
    * trigger-search input q2 AND j9 both scan; materialized so the distinct
    * runs once per JVM, like its sibling [[swTx]] store. */
  private def swapLegs(s: SparkSession, dir: String): DataFrame =
    ChainFixture.materialize(s, s"swlegs_${ChainFixture.dirKey(dir)}",
      swaps(s, dir).filter(col("pool").isNotNull)
        .select("block_number", "tx_idx", "tx_hash", "pool", "direction")
        .distinct())

  /** J9 (domain form): find_trigger_tx (atomic_arb.rs:239-311) — for each
    * arb tx, the earliest prior tx within the 2-block window that swapped
    * one of the arb's pools in the OPPOSITE direction (token_in == arb leg's
    * token_out), preferring the arb's own block (the reference walks
    * this-block txs before the previous block's). Candidates at swap grain;
    * the match join is equi-keyed on (wnd = arb block, pool). */
  private[graft] def triggerPicks(arbTxs: DataFrame, swapsDf: DataFrame): DataFrame = {
    val legs = swapsDf.filter(col("pool").isNotNull)
      .join(arbTxs.select("tx_hash"), "tx_hash")
      .select(col("tx_hash"), col("block_number").as("a_block"),
        (col("block_number") * TxPerBlock + col("tx_idx")).as("a_ord"),
        col("pool").as("a_pool"), col("direction").as("a_dir"))
      .distinct()
    val cands = windowed(swapsDf.filter(col("pool").isNotNull)
        .select("block_number", "tx_idx", "tx_hash", "pool", "direction")
        .distinct())
      .select(col("wnd"), col("pool").as("t_pool"), col("direction").as("t_dir"),
        col("ord").as("t_ord"), col("block_number").as("t_block"),
        col("tx_hash").as("t_tx"))
    val w = Window.partitionBy("tx_hash")
      .orderBy((col("a_block") - col("t_block")).asc, col("t_ord").asc, col("t_tx").asc)
    legs.join(cands, col("wnd") === col("a_block") && col("t_pool") === col("a_pool") &&
        col("t_dir") =!= col("a_dir") && col("t_ord") < col("a_ord"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("tx_hash"), col("t_tx").as("trigger_tx"),
        (col("t_block") === col("a_block")).as("trig_same_block"))
  }

  /** J8: mint immediately followed by burn on the same (block, eoa, pool). */
  /** Materialized like swTx/brackets: seven consumers (j10 ×2, j11 ×2,
    * q9_possible_mev, q9_mev_count, q9_builder_pnl) read the mint→burn
    * pair table, so the window over the actions scan runs once per JVM. */
  private[domain] def jitPairs(s: SparkSession, dir: String): DataFrame =
    ChainFixture.materialize(s, s"jitp_${ChainFixture.dirKey(dir)}",
      jitPairsOf(actionsTable(s, dir)))

  /** [[jitPairs]] parameterized over any actions-shaped frame — the tip
    * composer classifies JIT brackets on a micro-batch slice through the
    * SAME window (block-local, so a slice's pairs are bit-identical to the
    * batch table's rows for those blocks). */
  private[graft] def jitPairsOf(actionsDf: DataFrame): DataFrame = {
    val w = Window.partitionBy("block_number", "from_address", "pool")
      .orderBy("tx_idx", "trace_idx")
    actionsDf
      .filter(col("action_type").isin("mint", "burn") && col("pool").isNotNull)
      .withColumn("nxt", lead(col("action_type"), 1).over(w))
      .withColumn("nxt_idx", lead(col("tx_idx"), 1).over(w))
      .withColumn("nxt_tx", lead(col("tx_hash"), 1).over(w))
      .filter(col("action_type") === "mint" && col("nxt") === "burn")
      .select(col("block_number"), col("from_address").as("eoa"), col("pool"),
        col("tx_hash"), col("tx_idx").as("mint_idx"), col("nxt_idx").as("burn_idx"),
        col("nxt_tx").as("burn_tx"), col("protocol"))
  }

  // ── shared oracle fragments ───────────────────────────────────────────────

  private val swTxCte =
    s"""sw_tx AS (
      SELECT block_number, tx_idx, tx_hash, from_address AS eoa, pool,
        ARG_MIN(direction, trace_idx) AS dir,
        ARG_MIN(token_in_id, trace_idx) AS tok_in,
        ARG_MIN(token_out_id, trace_idx) AS tok_out,
        ${sqlSum("amount_in")} AS sum_in, ${sqlSum("amount_out")} AS sum_out
      FROM swaps WHERE pool IS NOT NULL
      GROUP BY 1, 2, 3, 4, 5)"""

  private val swWCte =
    s"""sw_w AS (
      SELECT *, unnest([block_number, block_number + 1]) AS wnd
      FROM (SELECT *, block_number * $TxPerBlock + tx_idx AS ord FROM sw_tx))"""

  private val brktCte =
    s"""brkt AS (
      SELECT wnd, front_block, back_block, eoa, pool, front_idx, front_ord,
        front_tx, dir, tok_in, tok_out, sum_in, sum_out,
        back_ord, back_in, back_out, back_tx,
        (ABS((sum_out / sum_in) /
             (${tokenPriceSql("tok_in")} / ${tokenPriceSql("tok_out")}) - 1) <= $MaxPriceDiff
         AND ABS((back_out / back_in) /
             (${tokenPriceSql("back_tok_in")} / ${tokenPriceSql("back_tok_out")}) - 1) <= $MaxPriceDiff
        ) AS valid_pricing
      FROM (
        SELECT * FROM (
          SELECT wnd, block_number AS front_block, eoa, pool,
            tx_idx AS front_idx, ord AS front_ord, tx_hash AS front_tx,
            dir, tok_in, tok_out, sum_in, sum_out,
            LEAD(block_number) OVER w AS back_block, LEAD(ord) OVER w AS back_ord,
            LEAD(dir) OVER w AS back_dir,
            LEAD(tok_in) OVER w AS back_tok_in, LEAD(tok_out) OVER w AS back_tok_out,
            LEAD(sum_in) OVER w AS back_in, LEAD(sum_out) OVER w AS back_out,
            LEAD(tx_hash) OVER w AS back_tx
          FROM sw_w
          WINDOW w AS (PARTITION BY wnd, eoa, pool ORDER BY ord))
        WHERE back_ord IS NOT NULL AND dir <> back_dir AND back_block = wnd))"""

  /** The shrink recursion as generated CTEs — the SQL mirror of
    * [[sandwichesOf]]'s chain/range formulation (and of
    * [[BigMacOps.shrinkEmitExpr]]'s reachability walk, same shape as the
    * bm_ex chain): per-chain ranges, per-range victim verification, then
    * one DISTINCT-join CTE per shrink level. */
  private val sandCtes: String = {
    def onChain(a: String, b: String) =
      s"$a.wnd = $b.wnd AND $a.eoa = $b.eoa AND $a.pool = $b.pool"
    val exRounds = (0 until ShrinkRounds).map { d =>
      s"""s_ex${d + 1} AS (
        SELECT DISTINCT v.* FROM s_ex$d e JOIN s_ok v
          ON ${onChain("v", "e")}
         AND ((v.i = e.i + 1 AND v.j = e.j) OR (v.i = e.i AND v.j = e.j - 1))
        WHERE NOT e.ok AND e.j - e.i + 1 >= 2)"""
    }.mkString(",\n      ")
    val emitUnion = (0 to ShrinkRounds)
      .map(d => s"SELECT * FROM s_ex$d WHERE ok").mkString(" UNION ALL ")
    s"""s_pos AS (
      SELECT *, ROW_NUMBER() OVER wc AS pos,
        COUNT(*) OVER (PARTITION BY wnd, eoa, pool) AS np
      FROM sw_w
      WINDOW wc AS (PARTITION BY wnd, eoa, pool ORDER BY ord)),
    s_cand AS (
      SELECT f.wnd, f.eoa, f.pool, f.np - 1 AS m, f.pos AS i, b.pos - 1 AS j,
        f.block_number AS front_block, f.tx_idx AS front_idx,
        f.ord AS front_ord, f.tx_hash AS front_tx,
        f.dir, f.tok_in, f.tok_out, f.sum_in, f.sum_out,
        b.block_number AS back_block, b.ord AS back_ord, b.dir AS back_dir,
        b.sum_in AS back_in, b.sum_out AS back_out, b.tx_hash AS back_tx,
        (ABS((f.sum_out / f.sum_in) /
             (${tokenPriceSql("f.tok_in")} / ${tokenPriceSql("f.tok_out")}) - 1)
           <= $MaxPriceDiff
         AND ABS((b.sum_out / b.sum_in) /
             (${tokenPriceSql("b.tok_in")} / ${tokenPriceSql("b.tok_out")}) - 1)
           <= $MaxPriceDiff) AS valid_pricing
      FROM s_pos f JOIN s_pos b
        ON ${onChain("b", "f")} AND b.pos - 1 >= f.pos
      WHERE f.np >= 2
        AND (f.pos - 1) + ((f.np - 1) - (b.pos - 1)) <= $ShrinkRounds),
    s_stat AS MATERIALIZED (
      SELECT c.*,
        COUNT(DISTINCT CASE WHEN v.pool = c.pool AND v.dir = c.dir
                            THEN v.tx_hash END) AS n_victims,
        COUNT(DISTINCT v.tx_hash) AS n_cand_txs
      FROM s_cand c LEFT JOIN sw_w v
        ON v.wnd = c.wnd AND v.eoa <> c.eoa
       AND v.ord > c.front_ord AND v.ord < c.back_ord
      GROUP BY ALL),
    s_ok AS (
      SELECT *, (n_victims >= 1
        AND n_victims * $MinVictimRatioDen >= n_cand_txs
        AND valid_pricing AND dir <> back_dir) AS ok
      FROM s_stat),
    s_ex0 AS (SELECT * FROM s_ok WHERE i = 1 AND j = m),
    $exRounds,
    sand AS (
      SELECT wnd, front_block, back_block, eoa, pool, front_idx, front_ord,
        front_tx, dir, tok_in, tok_out, sum_in, sum_out, back_ord, back_in,
        back_out, back_tx, valid_pricing, n_victims, n_cand_txs,
        (i - 1) + (m - j) AS found_at_iter
      FROM ($emitUnion)
      WHERE back_block = wnd)"""
  }

  private[domain] val sandwichCtes = s"$swTxCte, $swWCte, $brktCte, $sandCtes"

  /** Oracle CTE bundles for the tip-mode end-to-end entry (streaming
    * package): the SAME batch formulations q1/q2 hash-check against. */
  private[graft] def sandwichOracleCtes: String = sandwichCtes
  private[graft] def arbOracleCtes: String = s"$arbCte, $trigCtes"

  /** Oracle CTE bundle for the tip-mode full-composer entry: the sandwich
    * chain (incl. sw_tx/sw_w/brkt), the arb set, and the JIT pair table —
    * the candidate surfaces the J10 composer SQL builds on. */
  private[graft] def composerOracleCtes: String =
    s"$sandwichCtes, $arbCte, $jitpCte"

  private[domain] val arbCte =
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

  /** Trigger-pick CTEs (need `arb` in scope). */
  private val trigCtes =
    s"""tleg AS (
      SELECT DISTINCT s.tx_hash, s.block_number AS a_block,
        s.block_number * $TxPerBlock + s.tx_idx AS a_ord,
        s.pool AS a_pool, s.direction AS a_dir
      FROM swaps s JOIN arb a ON s.tx_hash = a.tx_hash
      WHERE s.pool IS NOT NULL),
    tcand AS (
      SELECT *, unnest([block_number, block_number + 1]) AS wnd
      FROM (
        SELECT DISTINCT block_number, block_number * $TxPerBlock + tx_idx AS ord,
          pool, direction AS dir, tx_hash
        FROM swaps WHERE pool IS NOT NULL)),
    tpick AS (
      SELECT tx_hash, t_tx AS trigger_tx, t_block = a_block AS trig_same_block
      FROM (
        SELECT l.tx_hash, l.a_block, c.tx_hash AS t_tx, c.block_number AS t_block,
          ROW_NUMBER() OVER (PARTITION BY l.tx_hash
            ORDER BY l.a_block - c.block_number, c.ord, c.tx_hash) AS rn
        FROM tleg l JOIN tcand c
          ON c.wnd = l.a_block AND c.pool = l.a_pool
         AND c.dir <> l.a_dir AND c.ord < l.a_ord)
      WHERE rn = 1)"""

  private[domain] val jitpCte =
    """jitp AS (
      SELECT block_number, eoa, pool, tx_hash, tx_idx AS mint_idx,
        nxt_idx AS burn_idx, nxt_tx AS burn_tx, protocol
      FROM (
        SELECT block_number, from_address AS eoa, pool, tx_hash, tx_idx,
          action_type, protocol,
          LEAD(action_type) OVER w AS nxt, LEAD(tx_idx) OVER w AS nxt_idx,
          LEAD(tx_hash) OVER w AS nxt_tx
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
    * txs with header PnL, carrying the C5-stitched collateral valuation
    * ([[ClassifyOps.stitchedLiquidations]]): frames whose decoded amounts
    * live only in child transfer frames contribute through the harvested
    * transfer amount and token, exactly as the reference's `parse_v2_v3`
    * fill feeds its liquidation inspector. */
  private val q7Liquidations = QueryDef(
    "q7_liquidations",
    (s, dir) => {
      val liq = actionsTable(s, dir).filter(col("action_type") === "liquidation")
        .groupBy("tx_hash").agg(count(lit(1)).as("n_liq"))
      val coll = ClassifyOps.stitchedLiquidations(actionsTable(s, dir))
        .filter(col("liquidated_collateral").isNotNull &&
          col("coll_tok_eff").isNotNull)
        .withColumn("coll_usd",
          col("liquidated_collateral") * tokenPrice(col("coll_tok_eff")))
        .groupBy(col("tx_hash").as("c_hash"))
        .agg(dsumR(col("coll_usd")).as("tx_coll_usd"))
      liq.join(bundleHeaders(s, dir), "tx_hash")
        .join(coll, col("tx_hash") === col("c_hash"), "left")
        .groupBy("block_number")
        .agg(count(lit(1)).as("n_liq_txs"),
          sum(col("n_liq")).as("n_liquidations"),
          dsum(col("profit_usd")).as("sum_profit"),
          dsum(col("gas_usd")).as("sum_gas"),
          dsum(col("tx_coll_usd")).as("sum_collateral_usd"))
        .orderBy("block_number")
    },
    withCtes(s"""liqtx AS (
        SELECT tx_hash, COUNT(*) AS n_liq FROM actions
        WHERE action_type = 'liquidation' GROUP BY 1),
      ${ClassifyOps.stitchedLiqCte},
      liqcoll AS (
        SELECT tx_hash AS c_hash,
          ${sqlSumR(s"liquidated_collateral * ${tokenPriceSql("coll_tok_eff")}")}
            AS tx_coll_usd
        FROM liq_st
        WHERE liquidated_collateral IS NOT NULL AND coll_tok_eff IS NOT NULL
        GROUP BY 1)
      SELECT h.block_number, COUNT(*) AS n_liq_txs,
        CAST(SUM(l.n_liq) AS BIGINT) AS n_liquidations,
        ${sqlSum("h.profit_usd")} AS sum_profit,
        ${sqlSum("h.gas_usd")} AS sum_gas,
        ${sqlSum("c.tx_coll_usd")} AS sum_collateral_usd
      FROM liqtx l JOIN header h ON l.tx_hash = h.tx_hash
      LEFT JOIN liqcoll c ON l.tx_hash = c.c_hash
      GROUP BY 1 ORDER BY 1"""))

  /** The per-tx liquidation bundle core, DataFrame-parameterized so the
    * golden battery drives the dataflow q7_liq_bundles runs. Mirrors
    * `calculate_liquidation` (liquidations.rs:76-156): a tx is a bundle
    * only if it carries ≥1 liquidation event; `liquidation_swaps` ride
    * along as a count; revenue is the A1–A3 header's delta accounting
    * (the reference folds transfers — in our model swap/mint/burn legs
    * carry the same flows post-C7 double-count removal); profit passes
    * the shared [[Accounting.pricedProfitGate]] (unpriced-token txs and
    * the ±15M clamp zero out, flag dropped). */
  private[graft] def liquidationBundlesOf(
      actionsDf: DataFrame, headers: DataFrame): DataFrame = {
    val liq = actionsDf.filter(col("action_type") === "liquidation")
      .groupBy("tx_hash").agg(count(lit(1)).as("n_liq"))
    val sw = actionsDf.filter(col("action_type") === "swap" &&
        col("amount_in").isNotNull && col("amount_out").isNotNull)
      .groupBy("tx_hash").agg(count(lit(1)).as("n_liq_swaps"))
    val unp = unpricedTxs(actionsDf).withColumn("unp", lit(1))
    pricedProfitGate(
      liq.join(sw, Seq("tx_hash"), "left")
        .withColumn("n_liq_swaps", coalesce(col("n_liq_swaps"), lit(0L)))
        .join(headers, "tx_hash")
        .join(unp, Seq("tx_hash"), "left")
        .withColumn("priced", when(col("unp").isNull, 1).otherwise(0))
        .drop("unp"))
      .select("tx_hash", "block_number", "eoa", "n_liq", "n_liq_swaps",
        "revenue_usd", "gas_usd", "profit_usd", "has_dex_price")
  }

  /** Q7 (bundle form): one row per liquidation tx with the reference's
    * header semantics — has_dex_price + the ±15M profit clamp
    * (liquidations.rs:100-124) — alongside the q7_liquidations per-block
    * rollup. Scale shape: three tx_hash-keyed rollups off the pruned
    * actions scan joined to the materialized header — all equi-joins. */
  private val q7LiqBundles = QueryDef(
    "q7_liq_bundles",
    (s, dir) => liquidationBundlesOf(actionsTable(s, dir), bundleHeaders(s, dir))
      .orderBy("tx_hash"),
    withCtes(s"""liqb AS (
        SELECT tx_hash, COUNT(*) AS n_liq FROM actions
        WHERE action_type = 'liquidation' GROUP BY 1),
      swb AS (SELECT tx_hash, COUNT(*) AS n_liq_swaps FROM swaps GROUP BY 1),
      unpriced AS (
        SELECT DISTINCT tx_hash FROM actions
        WHERE (token_in_id IS NOT NULL AND dec_in IS NULL)
           OR (token_out_id IS NOT NULL AND dec_out IS NULL)),
      liqbase AS (
        SELECT l.tx_hash, h.block_number, h.eoa, l.n_liq,
          CAST(COALESCE(s.n_liq_swaps, 0) AS BIGINT) AS n_liq_swaps,
          h.revenue_usd, h.gas_usd,
          CASE WHEN u.tx_hash IS NULL THEN 1 ELSE 0 END AS priced
        FROM liqb l JOIN header h ON l.tx_hash = h.tx_hash
        LEFT JOIN swb s ON l.tx_hash = s.tx_hash
        LEFT JOIN unpriced u ON l.tx_hash = u.tx_hash)
      SELECT tx_hash, block_number, eoa, n_liq, n_liq_swaps,
        revenue_usd, gas_usd,
        ${sqlGateProfit("revenue_usd - gas_usd", "priced")} AS profit_usd,
        ${sqlGateFlag("revenue_usd - gas_usd", "priced")} AS has_dex_price
      FROM liqbase ORDER BY tx_hash"""))

  /** The per-tx searcher-activity core (searcher_activity.rs:54-138):
    * only txs from a LABELED searcher EOA with ≥1 transfer become
    * SearcherTx bundles; profit passes the same priced gate + clamp. */
  private[graft] def searcherTxOf(actionsDf: DataFrame, headers: DataFrame,
      searchersDf: DataFrame): DataFrame = {
    val xfers = actionsDf.filter(col("action_type") === "transfer")
      .groupBy("tx_hash").agg(count(lit(1)).as("n_transfers"))
    val unp = unpricedTxs(actionsDf).withColumn("unp", lit(1))
    pricedProfitGate(
      xfers.join(headers, "tx_hash")
        .join(broadcast(searchersDf.withColumnRenamed("s_eoa", "eoa")), Seq("eoa"))
        .join(unp, Seq("tx_hash"), "left")
        .withColumn("priced", when(col("unp").isNull, 1).otherwise(0))
        .drop("unp"))
      .select("tx_hash", "block_number", "eoa", "n_transfers",
        "revenue_usd", "gas_usd", "profit_usd", "has_dex_price")
  }

  /** Q8 (bundle form): the per-tx SearcherTx emission with the priced
    * gate, alongside the q8_searcher_activity per-EOA rollup. The
    * searcher label set is a broadcast dimension (J1's lookup shape). */
  private val q8SearcherTx = QueryDef(
    "q8_searcher_tx",
    (s, dir) => searcherTxOf(actionsTable(s, dir), bundleHeaders(s, dir),
      ChainFixture.searchers(s)).orderBy("tx_hash"),
    withCtes(s"""xfers AS (
        SELECT tx_hash, COUNT(*) AS n_transfers FROM actions
        WHERE action_type = 'transfer' GROUP BY 1),
      unpriced AS (
        SELECT DISTINCT tx_hash FROM actions
        WHERE (token_in_id IS NOT NULL AND dec_in IS NULL)
           OR (token_out_id IS NOT NULL AND dec_out IS NULL)),
      searchers3 AS $searchersCteBody,
      stxbase AS (
        SELECT x.tx_hash, h.block_number, h.eoa, x.n_transfers,
          h.revenue_usd, h.gas_usd,
          CASE WHEN u.tx_hash IS NULL THEN 1 ELSE 0 END AS priced
        FROM xfers x JOIN header h ON x.tx_hash = h.tx_hash
        JOIN searchers3 s ON h.eoa = s.s_eoa
        LEFT JOIN unpriced u ON x.tx_hash = u.tx_hash)
      SELECT tx_hash, block_number, eoa, n_transfers, revenue_usd, gas_usd,
        ${sqlGateProfit("revenue_usd - gas_usd", "priced")} AS profit_usd,
        ${sqlGateFlag("revenue_usd - gas_usd", "priced")} AS has_dex_price
      FROM stxbase ORDER BY tx_hash"""))

  /** Q2: atomic arbitrage — cyclic continuous swap paths classified
    * Triangle / CrossPair / Stablecoin / LongTail (backrun.rs:54), PnL from
    * the A3 header, plus the 2-block trigger-tx search (J9 domain form):
    * how many arbs have an identifiable prior opposite-direction swap in
    * the window, and how many found it only in the PREVIOUS block. */
  private val q2AtomicArb = QueryDef(
    "q2_atomic_arb",
    (s, dir) => {
      val searchers = ChainFixture.searchers(s)
      val a = arbs(s, dir)
      a.join(bundleHeaders(s, dir), "tx_hash")
        .join(broadcast(searchers), col("eoa") === col("s_eoa"), "left")
        .join(triggerPicks(a, swapLegs(s, dir)), Seq("tx_hash"), "left")
        // validity heuristic (atomic_arb.rs:180-198): profitable OR known
        // searcher OR an outsized bribe (gas spend)
        .withColumn("is_valid", col("profit_usd") > 0 ||
          col("s_eoa").isNotNull || col("gas_usd") > 50.0)
        .groupBy("arb_type")
        .agg(count(lit(1)).as("n_arbs"),
          dsum(col("profit_usd")).as("sum_profit"),
          sum(when(col("profit_usd") > 0, 1L).otherwise(0L)).as("n_profitable"),
          sum(when(col("is_valid"), 1L).otherwise(0L)).as("n_valid"),
          sum(when(col("trigger_tx").isNotNull, 1L).otherwise(0L)).as("n_triggered"),
          sum(when(col("trig_same_block") === false, 1L).otherwise(0L)).as("n_prev_block_trigger"))
        .orderBy("arb_type")
    },
    withCtes(s"""$arbCte, $trigCtes,
      searchers2 AS $searchersCteBody
      SELECT a.arb_type, COUNT(*) AS n_arbs,
        ${sqlSum("h.profit_usd")} AS sum_profit,
        CAST(SUM(CASE WHEN h.profit_usd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_profitable,
        CAST(SUM(CASE WHEN h.profit_usd > 0 OR s.s_eoa IS NOT NULL
                       OR h.gas_usd > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        CAST(SUM(CASE WHEN t.trigger_tx IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_triggered,
        CAST(SUM(CASE WHEN t.trig_same_block = false THEN 1 ELSE 0 END) AS BIGINT) AS n_prev_block_trigger
      FROM arb a JOIN header h ON a.tx_hash = h.tx_hash
      LEFT JOIN searchers2 s ON h.eoa = s.s_eoa
      LEFT JOIN tpick t ON a.tx_hash = t.tx_hash
      GROUP BY 1 ORDER BY 1"""))

  /** J9 (domain form): per-arb trigger pick over the 2-block window —
    * one row per arb tx with the chosen trigger and whether it came from
    * the arb's own block or the previous one. */
  private val j9TriggerDomain = QueryDef(
    "j9_trigger_domain",
    (s, dir) => {
      val a = arbs(s, dir)
      a.select("tx_hash", "arb_type")
        .join(triggerPicks(a, swapLegs(s, dir)), Seq("tx_hash"), "left")
        // INT (not BOOLEAN): nullable booleans round-trip as None-vs-NaN
        // across the two engines' parquet/pandas paths
        .withColumn("trig_same_block", col("trig_same_block").cast("int"))
        .orderBy("tx_hash")
    },
    withCtes(s"""$arbCte, $trigCtes
      SELECT a.tx_hash, a.arb_type, t.trigger_tx,
        CAST(t.trig_same_block AS INTEGER) AS trig_same_block
      FROM arb a LEFT JOIN tpick t ON a.tx_hash = t.tx_hash
      ORDER BY 1"""))

  /** Q8: searcher-activity — profit attribution for the labeled searcher
    * set (a broadcast dimension, J1's lookup shape). */
  private val q8SearcherActivity = QueryDef(
    "q8_searcher_activity",
    (s, dir) => {
      val searchers = ChainFixture.searchers(s).withColumnRenamed("s_eoa", "eoa")
      bundleHeaders(s, dir)
        .join(broadcast(searchers), "eoa")
        .groupBy("eoa")
        .agg(count(lit(1)).as("n_txs"),
          dsum(col("profit_usd")).as("sum_profit"),
          sum(when(col("profit_usd") > 0, 1L).otherwise(0L)).as("n_profitable"))
        .orderBy("eoa")
    },
    withCtes(s"""searchers AS (SELECT s_eoa AS eoa FROM $searchersCteBody t2)
      SELECT h.eoa, COUNT(*) AS n_txs,
        ${sqlSum("h.profit_usd")} AS sum_profit,
        CAST(SUM(CASE WHEN h.profit_usd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_profitable
      FROM header h JOIN searchers s ON h.eoa = s.eoa
      GROUP BY 1 ORDER BY 1"""))

  /** Q1: sandwich inspector — verified 2-block brackets (victim ratio +
    * price sanity + shrink, [[sandwichesOf]]) with PnL from the A3 bundle
    * headers of the front AND back txs (searcher token deltas − gas,
    * shared_utils.rs:344-460), attributed to the back tx's block (the
    * reference emits from the most recent block of the window). */
  private val q1Sandwich = QueryDef(
    "q1_sandwich",
    (s, dir) => {
      val hdr = bundleHeaders(s, dir)
      sandwiches(s, dir)
        .join(hdr.select(col("tx_hash").as("front_tx"),
          col("profit_usd").as("front_profit")), "front_tx")
        .join(hdr.select(col("tx_hash").as("back_tx"),
          col("profit_usd").as("back_profit")), "back_tx")
        .withColumn("profit_usd", col("front_profit") + col("back_profit"))
        .groupBy(col("back_block").as("block_number"))
        .agg(count(lit(1)).as("n_sandwiches"),
          sum(col("n_victims")).as("n_victims"),
          sum(when(col("found_at_iter") > 0, 1L).otherwise(0L)).as("n_from_shrink"),
          // PRIMARY PnL: full delta-accounting over the bracket's txs via
          // the A1–A3 header (searcher address-set token deltas × prices −
          // gas, shared_utils.rs:344-460) …
          dsumR(col("profit_usd")).as("sum_profit"),
          // … with the bracket revenue model (back-run output − front-run
          // input, priced in the front token) kept as a cross-check column
          dsumR((col("back_out") - col("sum_in")) * tokenPrice(col("tok_in")))
            .as("sum_bracket_rev_usd"))
        .orderBy("block_number")
    },
    withCtes(s"""$sandwichCtes
      SELECT s.back_block AS block_number, COUNT(*) AS n_sandwiches,
        CAST(SUM(s.n_victims) AS BIGINT) AS n_victims,
        CAST(SUM(CASE WHEN s.found_at_iter > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_from_shrink,
        ${sqlSumR("hf.profit_usd + hb.profit_usd")} AS sum_profit,
        ${sqlSumR(s"(s.back_out - s.sum_in) * ${tokenPriceSql("s.tok_in")}")}
          AS sum_bracket_rev_usd
      FROM sand s
      JOIN header hf ON s.front_tx = hf.tx_hash
      JOIN header hb ON s.back_tx = hb.tx_hash
      GROUP BY 1 ORDER BY 1"""))

  /** The JIT bracket + victim core, DataFrame-parameterized so the golden
    * scenarios drive the SAME dataflow q5_jit runs (the reference pins this
    * behavior in jit/mod.rs's test battery: test_only_jit /
    * test_misclassified_jit / test_multihop_jit). `mintBurn` is
    * actions-shaped (block_number, from_address, pool, tx_idx, trace_idx,
    * action_type, token_in_id, token_out_id, amount_in, amount_out);
    * `victims` is sw_tx-shaped (block_number, tx_idx, eoa, pool). One row
    * per (block, eoa, pool) bracket with ≥ 1 NON-searcher victim swap
    * strictly inside the (mint_idx, burn_idx) range; fee_usd is the
    * burn-minus-mint fee-delta model priced per token. */
  private[graft] def jitBracketsOf(mintBurn: DataFrame, victims: DataFrame): DataFrame = {
    def side(t: String, agg: Column => Column, idxName: String) = mintBurn
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
    val v = victims.select(col("block_number").as("v_block"),
      col("pool").as("v_pool"), col("tx_idx").as("v_idx"), col("eoa").as("v_eoa"))
    jit.join(v, col("v_block") === col("block_number") && col("v_pool") === col("pool") &&
        col("v_idx") > col("mint_idx") && col("v_idx") < col("burn_idx") &&
        col("v_eoa") =!= col("eoa"))
      .groupBy("block_number", "eoa", "pool", "mint_idx", "burn_idx",
        "mint_t0", "mint_t1", "mint_in", "mint_out", "burn_in", "burn_out")
      .agg(count(lit(1)).as("n_victims"))
      .withColumn("fee_usd",
        (col("burn_in") - col("mint_in")) * tokenPrice(col("mint_t0")) +
          (col("burn_out") - col("mint_out")) * tokenPrice(col("mint_t1")))
  }

  /** Q5: JIT liquidity — mint→burn bracket (J8) with ≥1 victim swap in
    * between. Primary PnL is full delta-accounting over the bundle's
    * mint/burn txs via the A1–A3 header; the fee-delta model (burn minus
    * mint amounts priced per token) stays as a cross-check column. */
  private val q5Jit = QueryDef(
    "q5_jit",
    (s, dir) => {
      // no persist: caching the FULL-width actions table defeats column
      // pruning for its two consumers — each needs a handful of columns,
      // and two pruned scans of the compact store beat one full-width
      // cache materialization
      val a = actionsTable(s, dir)
      // PRIMARY PnL: full delta-accounting over the bundle's mint/burn txs
      // via the A1–A3 header (the searcher address-set's token deltas ×
      // prices − gas, shared_utils.rs:344-460); the fee-delta model stays
      // as the cross-check column sum_fee_usd
      val jtx = a.filter(col("action_type").isin("mint", "burn") &&
          col("pool").isNotNull &&
          col("amount_in").isNotNull && col("amount_out").isNotNull)
        .select(col("block_number"), col("from_address").as("eoa"),
          col("pool"), col("tx_hash")).distinct()
      val jpnl = jtx.join(bundleHeaders(s, dir)
          .select(col("tx_hash"), col("profit_usd")), "tx_hash")
        .groupBy("block_number", "eoa", "pool")
        .agg(dsumR(col("profit_usd")).as("acct_profit"),
          count(lit(1)).as("n_bundle_txs"))
      jitBracketsOf(a, swTx(s, dir))
        .join(jpnl, Seq("block_number", "eoa", "pool"))
        .groupBy("block_number")
        .agg(count(lit(1)).as("n_jit"), sum(col("n_victims")).as("n_victims"),
          dsum(col("acct_profit")).as("sum_profit_usd"),
          sum(col("n_bundle_txs")).as("n_bundle_txs"),
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
        GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11),
      jtx5 AS (
        SELECT DISTINCT block_number, from_address AS eoa, pool, tx_hash
        FROM actions WHERE action_type IN ('mint','burn') AND pool IS NOT NULL
          AND amount_in IS NOT NULL AND amount_out IS NOT NULL),
      jpnl AS (
        SELECT j.block_number, j.eoa, j.pool,
          ${sqlSumR("h.profit_usd")} AS acct_profit, COUNT(*) AS n_bundle_txs
        FROM jtx5 j JOIN header h ON j.tx_hash = h.tx_hash
        GROUP BY 1, 2, 3)
      SELECT block_number, COUNT(*) AS n_jit,
        CAST(SUM(n_victims) AS BIGINT) AS n_victims,
        ${sqlSum("p.acct_profit")} AS sum_profit_usd,
        CAST(SUM(p.n_bundle_txs) AS BIGINT) AS n_bundle_txs,
        ${sqlSum(s"(burn_in - mint_in) * ${tokenPriceSql("mint_t0")} + (burn_out - mint_out) * ${tokenPriceSql("mint_t1")}")} AS sum_fee_usd
      FROM jitv JOIN jpnl p USING (block_number, eoa, pool)
      GROUP BY 1 ORDER BY 1"""))

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

  /** The reference's MEV_DEDUPLICATION_FILTER as (dominant, subordinate)
    * PAIRS (composer/mev_filters.rs:102-117, define_mev_precedence) — NOT
    * a total order: sandwich does not dominate jit, nothing dominates
    * liquidation, and arb↔cexdex is MUTUAL (sequenced + conditioned by
    * atomic_dedup_fn, :72-101). Single definition site; both j10 queries
    * and their oracles derive from this Seq. */
  val ComposerMatrix: Seq[(String, String)] = Seq(
    "sandwich" -> "arb", "sandwich" -> "cexdex",
    "jit" -> "arb",
    "liquidation" -> "arb", "liquidation" -> "cexdex",
    "jit_sandwich" -> "arb", "jit_sandwich" -> "cexdex",
    "jit_sandwich" -> "jit", "jit_sandwich" -> "sandwich",
    "jit_cexdex" -> "arb", "jit_cexdex" -> "cexdex", "jit_cexdex" -> "jit",
    "arb" -> "cexdex", // e1: conditional (atomic_dedup_fn)
    "cexdex" -> "arb") // e2: dominant side = e1 survivors

  /** J10: composer dedup at tx grain — a candidate claim (tx, type) is
    * dropped when the same tx carries a claim of a type that DOMINATES it
    * in [[ComposerMatrix]]. Among {sandwich, jit, liquidation, arb} only
    * arb is subordinate; the others COEXIST on a shared tx (the reference
    * never forces one bundle per tx — the old prio ladder did). */
  private val j10ComposerDedup = QueryDef(
    "j10_composer_dedup",
    (s, dir) => {
      import s.implicits._
      val sand = sandwiches(s, dir).select(col("front_tx").as("tx_hash"))
        .withColumn("mev_type", lit("sandwich"))
      val jit = jitPairs(s, dir).select(col("tx_hash"))
        .withColumn("mev_type", lit("jit"))
      val liq = actionsTable(s, dir).filter(col("action_type") === "liquidation")
        .select("tx_hash").distinct()
        .withColumn("mev_type", lit("liquidation"))
      val arb = arbs(s, dir).select(col("tx_hash"))
        .withColumn("mev_type", lit("arb"))
      val all = sand.unionByName(jit).unionByName(liq).unionByName(arb)
        .distinct().persist()
      val types = Seq("sandwich", "jit", "liquidation", "arb")
      val pairs = ComposerMatrix
        .filter { case (d, x) => types.contains(d) && types.contains(x) }
        .toDF("dom_type", "sub_type")
      val dom = all.select(col("tx_hash").as("d_tx"), col("mev_type").as("d_type"))
      val removed = all
        .join(broadcast(pairs), col("mev_type") === col("sub_type"))
        .join(dom, col("tx_hash") === col("d_tx") && col("d_type") === col("dom_type"),
          "left_semi")
        .select("tx_hash", "mev_type").distinct()
      all.join(removed.withColumn("rm", lit(1)), Seq("tx_hash", "mev_type"), "left")
        .groupBy("mev_type")
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("rm").isNull, 1L).otherwise(0L)).as("n_final"))
        .orderBy("mev_type")
    },
    withCtes(s"""$sandwichCtes, $arbCte, $jitpCte,
      cand AS (
        SELECT DISTINCT tx_hash, mev_type FROM (
          SELECT front_tx AS tx_hash, 'sandwich' AS mev_type FROM sand
          UNION ALL SELECT tx_hash, 'jit' FROM jitp
          UNION ALL SELECT DISTINCT tx_hash, 'liquidation' FROM actions
            WHERE action_type = 'liquidation'
          UNION ALL SELECT tx_hash, 'arb' FROM arb)),
      mx AS (SELECT * FROM (VALUES ${ComposerMatrix
        .filter { case (d, x) =>
          Seq("sandwich", "jit", "liquidation", "arb").contains(d) &&
            Seq("sandwich", "jit", "liquidation", "arb").contains(x) }
        .map { case (d, x) => s"('$d','$x')" }.mkString(", ")})
        t(dom_type, sub_type)),
      rem AS (
        SELECT DISTINCT c.tx_hash, c.mev_type
        FROM cand c JOIN mx ON c.mev_type = mx.sub_type
        JOIN cand d ON d.tx_hash = c.tx_hash AND d.mev_type = mx.dom_type)
      SELECT c.mev_type, COUNT(*) AS n_raw,
        CAST(SUM(CASE WHEN r.tx_hash IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_final
      FROM cand c LEFT JOIN rem r
        ON c.tx_hash = r.tx_hash AND c.mev_type = r.mev_type
      GROUP BY 1 ORDER BY 1"""))

  /** J10 (full semantics): tx-SET bundle dedup — the reference's two-layer
    * composer dedup expressed declaratively over an exploded (bundle, tx)
    * edge table, both layers equi-keyed on tx_hash:
    *   1. cross-type (composer/mod.rs:190-232 deduplicate_mev): a bundle is
    *      removed when any of its txs appears in a bundle of a DOMINANT MEV
    *      type per the pairwise [[ComposerMatrix]] (MEV_DEDUPLICATION_FILTER,
    *      mev_filters.rs:102-117) — including its two non-total-order
    *      features: (a) the arb→cexdex kill is CONDITIONED by
    *      atomic_dedup_fn (:72-101: fires only when the arb is not a
    *      triangle, out-earns the cexdex, and the cexdex isn't
    *      searcher-labeled), and (b) the mutual cexdex→arb kill is
    *      SEQUENCED after it — only cexdex bundles surviving (a) remove
    *      arbs, mirroring the composer's in-order filter application;
    *   2. within-type (shared_utils.rs:655-710 dedup_bundles): of two
    *      same-type bundles sharing a tx, the one with MORE transactions
    *      wins; equal sizes keep the LOWER profit ("most likely more
    *      correct"), with a bundle-id tiebreak to stay total.
    * Six types participate: the four candidate sets plus cexdex
    * (single-swap txs priced by the markout inspectors) and jit_sandwich
    * (the J11 composition), so every matrix row has live rows. Multi-tx
    * sets are real: sandwiches carry {front, back}, JITs {mint, burn},
    * compositions all four. */
  /** The cross-type layer of the composer dedup, matrix-driven, over a
    * (bid, mev_type, tx, profit, arb_type, labeled) edge frame → the bids
    * removed. Unconditional pairs of [[ComposerMatrix]] go through the
    * pair table in one shot; the mutual arb↔cexdex pair is SEQUENCED —
    * e1 (the conditional atomic_dedup_fn kill of cexdex by arb), then e2
    * (arb kills) driven by e1's survivors only. Unit-tested on planted
    * bundles in GoldenScenarioSpec. */
  private[graft] def matrixCrossKills(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val uncond = ComposerMatrix
      .filterNot(p => p == ("arb", "cexdex") || p == ("cexdex", "arb"))
      .toDF("dom_type", "sub_type")
    val domE = edges.select(col("tx").as("d_tx"), col("mev_type").as("d_type"))
    val uncondRem = edges
      .join(broadcast(uncond), col("mev_type") === col("sub_type"))
      .join(domE, col("tx") === col("d_tx") && col("d_type") === col("dom_type"),
        "left_semi")
      .select("bid").distinct()
    val arbE = edges.filter(col("mev_type") === "arb")
    val cexE = edges.filter(col("mev_type") === "cexdex")
    val e1kill = cexE
      .join(arbE.select(col("tx").as("a_tx"), col("profit").as("a_profit"),
        col("arb_type").as("a_type")),
        col("tx") === col("a_tx") && col("a_type") =!= "triangle" &&
          col("a_profit") > col("profit") && !col("labeled"), "left_semi")
      .select("bid").distinct()
    val e2kill = arbE
      .join(cexE.join(e1kill, Seq("bid"), "left_anti")
        .select(col("tx").as("c_tx")),
        col("tx") === col("c_tx"), "left_semi")
      .select("bid").distinct()
    uncondRem.unionByName(e1kill).unionByName(e2kill).distinct()
  }

  private val j10BundleDedup = QueryDef(
    "j10_bundle_dedup",
    (s, dir) => {
      val hdr = bundleHeaders(s, dir)
        .select(col("tx_hash").as("h_tx"), col("profit_usd"),
          col("eoa").as("h_eoa"), col("block_number").as("h_block"))
      val sand = sandwiches(s, dir).select(
        concat(col("front_tx"), lit("|"), col("back_tx"), lit("|"), col("pool"))
          .as("bid"),
        lit("sandwich").as("mev_type"),
        (col("back_out") - col("sum_in")).as("profit"),
        array(col("front_tx"), col("back_tx")).as("txs"),
        lit(null).cast("string").as("arb_type"), lit(false).as("labeled")).distinct()
      val jit = jitPairs(s, dir).select(
        concat(col("tx_hash"), lit("|"), col("burn_tx"), lit("|"), col("pool"))
          .as("bid"),
        lit("jit").as("mev_type"), lit(0.0).as("profit"),
        array(col("tx_hash"), col("burn_tx")).as("txs"),
        lit(null).cast("string").as("arb_type"), lit(false).as("labeled")).distinct()
      val liq = actionsTable(s, dir)
        .filter(col("action_type") === "liquidation")
        .select(col("tx_hash")).distinct()
        .select(col("tx_hash").as("bid"), lit("liquidation").as("mev_type"),
          lit(0.0).as("profit"), array(col("tx_hash")).as("txs"),
          lit(null).cast("string").as("arb_type"), lit(false).as("labeled"))
      val arb = arbs(s, dir)
        .join(hdr, col("tx_hash") === col("h_tx"))
        .select(col("tx_hash").as("bid"), lit("arb").as("mev_type"),
          col("profit_usd").as("profit"), array(col("tx_hash")).as("txs"),
          col("arb_type"), lit(false).as("labeled"))
      // cexdex candidates: lone-swap txs (the classic one-leg-vs-CEX shape;
      // an arb needs >= 2 legs, so the sets are disjoint by construction)
      val cexdexBase = swaps(s, dir).groupBy("tx_hash")
        .agg(count(lit(1)).as("n_sw")).filter(col("n_sw") === 1)
        .join(hdr, col("tx_hash") === col("h_tx"))
        .join(broadcast(ChainFixture.searchers(s)),
          col("h_eoa") === col("s_eoa"), "left")
      val cexdex = cexdexBase
        .select(col("tx_hash").as("bid"), lit("cexdex").as("mev_type"),
          col("profit_usd").as("profit"), array(col("tx_hash")).as("txs"),
          lit(null).cast("string").as("arb_type"),
          col("s_eoa").isNotNull.as("labeled"))
      // jit_cexdex composition (the e9 matrix row, Q6's shape): a JIT
      // bracket whose EOA also ran a lone-swap cexdex leg in the block
      val jcx = jitPairs(s, dir).select(col("block_number").as("x_block"),
          col("eoa").as("x_eoa"), col("tx_hash").as("mint_tx"), col("burn_tx"))
        .join(cexdexBase.select(col("tx_hash").as("cx_tx"),
          col("h_block"), col("h_eoa"), col("profit_usd")),
          col("x_block") === col("h_block") && col("x_eoa") === col("h_eoa"))
        .select(
          concat(col("mint_tx"), lit("|"), col("burn_tx"), lit("|"), col("cx_tx"))
            .as("bid"),
          lit("jit_cexdex").as("mev_type"), col("profit_usd").as("profit"),
          array(col("mint_tx"), col("burn_tx"), col("cx_tx")).as("txs"),
          lit(null).cast("string").as("arb_type"), lit(false).as("labeled"))
        .distinct()
      val jsw = brackets(s, dir).select(col("back_block"), col("eoa"),
          col("front_tx"), col("back_tx"),
          (col("back_out") - col("sum_in")).as("b_profit"))
        .join(jitPairs(s, dir).select(col("block_number").as("j_block"),
          col("eoa").as("j_eoa"), col("tx_hash").as("mint_tx"), col("burn_tx")),
          col("back_block") === col("j_block") && col("eoa") === col("j_eoa"))
        .select(
          concat(col("front_tx"), lit("|"), col("back_tx"), lit("|"),
            col("mint_tx"), lit("|"), col("burn_tx")).as("bid"),
          lit("jit_sandwich").as("mev_type"), col("b_profit").as("profit"),
          array(col("front_tx"), col("back_tx"), col("mint_tx"), col("burn_tx"))
            .as("txs"),
          lit(null).cast("string").as("arb_type"), lit(false).as("labeled"))
        .distinct()
      // the bundle table is a PIPELINE INTERMEDIATE, exactly as in the
      // reference (inspectors persist their bundles, the composer reads
      // the stored tables) — materialized once per JVM so the seven
      // candidate scans don't rebuild per downstream branch
      val bundles = ChainFixture.materialize(s,
        s"bundles_${ChainFixture.dirKey(dir)}",
        sand.unionByName(jit).unionByName(liq).unionByName(arb)
          .unionByName(cexdex).unionByName(jsw).unionByName(jcx)
          // bid is only unique WITHIN a type (liquidation/arb/cexdex all
          // key by bare tx hash) — prefix with the type, or a cross-type
          // kill of one bundle silently removes every same-bid bundle
          .withColumn("bid", concat_ws("|", col("mev_type"), col("bid")))
          .withColumn("n_txs", size(array_distinct(col("txs")))))
      val edges = bundles.select(col("bid"), col("mev_type"),
        col("n_txs"), col("profit"), col("arb_type"), col("labeled"),
        explode(array_distinct(col("txs"))).as("tx"))
        .persist()
      // eager cut: seven downstream branches (three kill stages, xrem,
      // surv ×2, final counts) read `edges`; without materializing it
      // first, parallel stages race past the lazy cache and each re-derive
      // the full candidate DAG (the 4× bench regression)
      edges.count()
      val xrem = matrixCrossKills(edges).persist()
      val surv = edges.join(xrem, Seq("bid"), "left_anti").persist()
      val other = surv.select(col("tx").as("o_tx"), col("mev_type").as("o_type"),
        col("bid").as("o_bid"), col("n_txs").as("o_n"), col("profit").as("o_profit"))
      val wrem = surv
        .join(other, col("tx") === col("o_tx") && col("mev_type") === col("o_type") &&
          col("bid") =!= col("o_bid") &&
          (col("o_n") > col("n_txs") ||
            (col("o_n") === col("n_txs") &&
              (col("o_profit") < col("profit") ||
                (col("o_profit") === col("profit") && col("o_bid") < col("bid"))))),
          "left_semi")
        .select("bid").distinct()
      bundles
        .join(xrem.withColumn("xr", lit(1)), Seq("bid"), "left")
        .join(wrem.withColumn("wr", lit(1)), Seq("bid"), "left")
        .groupBy("mev_type")
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("xr").isNull, 1L).otherwise(0L)).as("n_cross"),
          sum(when(col("xr").isNull && col("wr").isNull, 1L).otherwise(0L))
            .as("n_final"))
        .orderBy("mev_type")
    },
    withCtes(s"""$sandwichCtes, $arbCte, $jitpCte,
      srch AS $searchersCteBody,
      cexd AS (
        SELECT s.tx_hash, h.profit_usd, h.block_number, h.eoa,
          (se.s_eoa IS NOT NULL) AS labeled
        FROM (SELECT tx_hash FROM swaps GROUP BY 1 HAVING COUNT(*) = 1) s
        JOIN header h ON s.tx_hash = h.tx_hash
        LEFT JOIN srch se ON h.eoa = se.s_eoa),
      bundles AS MATERIALIZED (
        SELECT mev_type || '|' || bid AS bid, mev_type, profit, txs,
          arb_type, labeled, len(list_distinct(txs)) AS n_txs FROM (
          SELECT DISTINCT front_tx || '|' || back_tx || '|' || pool AS bid,
            'sandwich' AS mev_type, back_out - sum_in AS profit,
            [front_tx, back_tx] AS txs,
            CAST(NULL AS VARCHAR) AS arb_type, FALSE AS labeled FROM sand
          UNION ALL
          SELECT DISTINCT tx_hash || '|' || burn_tx || '|' || pool,
            'jit', 0.0e0, [tx_hash, burn_tx], NULL, FALSE FROM jitp
          UNION ALL
          SELECT DISTINCT tx_hash, 'liquidation', 0.0e0, [tx_hash], NULL, FALSE
          FROM actions WHERE action_type = 'liquidation'
          UNION ALL
          SELECT a.tx_hash, 'arb', h.profit_usd, [a.tx_hash], a.arb_type, FALSE
          FROM arb a JOIN header h ON a.tx_hash = h.tx_hash
          UNION ALL
          SELECT tx_hash, 'cexdex', profit_usd, [tx_hash], NULL, labeled
          FROM cexd
          UNION ALL
          SELECT DISTINCT b.front_tx || '|' || b.back_tx || '|'
              || j.tx_hash || '|' || j.burn_tx,
            'jit_sandwich', b.back_out - b.sum_in,
            [b.front_tx, b.back_tx, j.tx_hash, j.burn_tx], NULL, FALSE
          FROM brkt b JOIN jitp j
            ON b.back_block = j.block_number AND b.eoa = j.eoa
          UNION ALL
          SELECT DISTINCT j.tx_hash || '|' || j.burn_tx || '|' || c.tx_hash,
            'jit_cexdex', c.profit_usd,
            [j.tx_hash, j.burn_tx, c.tx_hash], NULL, FALSE
          FROM jitp j JOIN cexd c
            ON j.block_number = c.block_number AND j.eoa = c.eoa)),
      edges AS MATERIALIZED (
        SELECT bid, mev_type, n_txs, profit, arb_type, labeled,
          UNNEST(list_distinct(txs)) AS tx
        FROM bundles),
      mxb AS (SELECT * FROM (VALUES ${ComposerMatrix
        .filterNot(p => p == ("arb", "cexdex") || p == ("cexdex", "arb"))
        .map { case (d, x) => s"('$d','$x')" }.mkString(", ")})
        t(dom_type, sub_type)),
      urem AS (
        SELECT DISTINCT e.bid
        FROM edges e JOIN mxb ON e.mev_type = mxb.sub_type
        JOIN edges d ON d.tx = e.tx AND d.mev_type = mxb.dom_type),
      e1kill AS (
        SELECT DISTINCT c.bid
        FROM edges c JOIN edges a
          ON c.mev_type = 'cexdex' AND a.mev_type = 'arb' AND a.tx = c.tx
         AND a.arb_type <> 'triangle' AND a.profit > c.profit
         AND NOT c.labeled),
      e2kill AS (
        SELECT DISTINCT a.bid
        FROM edges a JOIN (
            SELECT c.* FROM edges c LEFT JOIN e1kill k ON c.bid = k.bid
            WHERE c.mev_type = 'cexdex' AND k.bid IS NULL) cs
          ON a.mev_type = 'arb' AND a.tx = cs.tx),
      xrem AS MATERIALIZED (
        SELECT bid FROM urem UNION SELECT bid FROM e1kill
        UNION SELECT bid FROM e2kill),
      surv AS MATERIALIZED (
        SELECT e.* FROM edges e LEFT JOIN xrem x ON e.bid = x.bid
        WHERE x.bid IS NULL),
      wrem AS (
        SELECT DISTINCT e.bid FROM surv e
        JOIN surv o ON e.tx = o.tx AND e.mev_type = o.mev_type
          AND e.bid <> o.bid
          AND (o.n_txs > e.n_txs OR (o.n_txs = e.n_txs
            AND (o.profit < e.profit
              OR (o.profit = e.profit AND o.bid < e.bid)))))
      SELECT b.mev_type, COUNT(*) AS n_raw,
        CAST(SUM(CASE WHEN x.bid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_cross,
        CAST(SUM(CASE WHEN x.bid IS NULL AND w.bid IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_final
      FROM bundles b
      LEFT JOIN xrem x ON b.bid = x.bid
      LEFT JOIN wrem w ON b.bid = w.bid
      GROUP BY 1 ORDER BY 1"""))

  /** J11: JitSandwich composition — (block, eoa) present in both the
    * sandwich-bracket and JIT-bracket candidate sets; brackets are
    * attributed to their back tx's block. */
  private val j11JitSandwich = QueryDef(
    "j11_jit_sandwich",
    (s, dir) => {
      val b = brackets(s, dir)
        .select(col("back_block").as("block_number"), col("eoa")).distinct()
      val j = jitPairs(s, dir).select("block_number", "eoa").distinct()
      b.join(j, Seq("block_number", "eoa"))
        .agg(count(lit(1)).as("n_composed"),
          countDistinct(col("block_number")).as("n_blocks"))
    },
    withCtes(s"""$swTxCte, $swWCte, $brktCte, $jitpCte
      SELECT COUNT(*) AS n_composed,
        CAST(COUNT(DISTINCT block_number) AS BIGINT) AS n_blocks
      FROM (SELECT DISTINCT back_block AS block_number, eoa FROM brkt) b
      JOIN (SELECT DISTINCT block_number, eoa FROM jitp) j USING (block_number, eoa)"""))

  /** The exact JitSandwich composition (`compose_sandwich_jit`,
    * brontes-types/src/mev/jit_sandwich.rs:109-180 via the
    * MEV_COMPOSABILITY_FILTER, composer_filters.rs:20-48): a sandwich and
    * a JIT bundle compose when they SHARE A TX HASH — the composer's
    * trigger is tx-hash overlap (`try_deduping_mev`,
    * composer/utils.rs:124-147), then the mints/burns attach only at the
    * sandwich positions whose hash matches the JIT's mint/burn tx
    * (jit_sandwich.rs:135-155; a non-matching side attaches None, the
    * composition still forms). Block/EOA overlap alone (the j11 census
    * heuristic) is NOT enough. DataFrame-parameterized for the golden
    * battery; inputs are sandwich-shaped ([[sandwichesOf]]) and
    * jitPairs-shaped frames. */
  private[graft] def composeJitSandwichOf(sand: DataFrame, jp: DataFrame): DataFrame =
    sand.join(jp.select(col("tx_hash").as("mint_tx"),
        col("burn_tx"), col("pool").as("jit_pool")),
      col("front_tx") === col("mint_tx") || col("back_tx") === col("burn_tx") ||
        col("front_tx") === col("burn_tx") || col("back_tx") === col("mint_tx"))
      .select(col("back_block").as("block_number"), col("eoa"), col("pool"),
        col("jit_pool"), col("front_tx"), col("back_tx"), col("n_victims"),
        (col("front_tx") === col("mint_tx")).cast("int").as("mint_at_front"),
        (col("back_tx") === col("burn_tx")).cast("int").as("burn_at_back"))

  /** J11 (exact form): the tx-hash-matched JitSandwich compositions per
    * block — with the attach-position split — alongside the
    * j11_jit_sandwich block/EOA census. */
  private val j11Composed = QueryDef(
    "j11_composed",
    (s, dir) => composeJitSandwichOf(sandwiches(s, dir), jitPairs(s, dir))
      .groupBy("block_number")
      .agg(count(lit(1)).as("n_composed"),
        sum(col("n_victims")).as("n_victims"),
        countDistinct(col("eoa")).as("n_eoas"),
        sum(col("mint_at_front")).as("n_mint_at_front"),
        sum(col("burn_at_back")).as("n_burn_at_back"))
      .orderBy("block_number"),
    withCtes(s"""$sandwichCtes, $jitpCte
      SELECT s2.back_block AS block_number, COUNT(*) AS n_composed,
        CAST(SUM(s2.n_victims) AS BIGINT) AS n_victims,
        CAST(COUNT(DISTINCT s2.eoa) AS BIGINT) AS n_eoas,
        CAST(SUM(CASE WHEN s2.front_tx = j.tx_hash THEN 1 ELSE 0 END) AS BIGINT)
          AS n_mint_at_front,
        CAST(SUM(CASE WHEN s2.back_tx = j.burn_tx THEN 1 ELSE 0 END) AS BIGINT)
          AS n_burn_at_back
      FROM sand s2 JOIN jitp j
        ON s2.front_tx = j.tx_hash OR s2.back_tx = j.burn_tx
        OR s2.front_tx = j.burn_tx OR s2.back_tx = j.tx_hash
      GROUP BY 1 ORDER BY 1"""))

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
      val sand = sandwiches(s, dir)
        .groupBy(col("back_block").as("block_number"))
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
    withCtes(s"""$sandwichCtes, $arbCte,
      hdrblk AS (
        SELECT block_number, COUNT(*) AS n_txs,
          ${sqlSum("gas_usd")} AS sum_gas, ${sqlSum("profit_usd")} AS sum_profit
        FROM header GROUP BY 1),
      sandblk AS (SELECT back_block AS block_number, COUNT(*) AS n_sandwich
                  FROM sand GROUP BY 1),
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

  /** `DISCOVERY_PRIORITY_FEE_MULTIPLIER` (composer/mod.rs:58): a tx's
    * priority fee must exceed the block mean by this many population
    * std-devs to trigger discovery. */
  val DiscoveryStdDevs = 2.0

  /** The missed-MEV discovery core (`DiscoveryInspector.find_possible_mev`,
    * discovery.rs:33-74, composed in composer/mod.rs:93-134): per-block
    * mean + POPULATION std-dev over per-tx priority fees
    * (tree/mod.rs:145-161); a tx becomes possible MEV when it made a
    * coinbase transfer OR paid > mean + 2σ priority fee — `is_private` is
    * REPORTED but never triggers alone (`was_triggered`,
    * mev/block.rs:350-354); txs claimed by any classified bundle are
    * removed (composer/mod.rs:118-127). Exact-decimal block sums keep the
    * σ boundary engine-exact; `txs` carries one row per tx with
    * priority_fee / is_private / coinbase_transfer, `claimed` the bundle
    * tx-hash set. DataFrame-parameterized for the golden battery. */
  private[graft] def possibleMevOf(txs: DataFrame, claimed: DataFrame): DataFrame = {
    val stats = txs.groupBy(col("block_number").as("s_block"))
      .agg(count(lit(1)).as("n_txs"),
        dsum(col("priority_fee")).as("sum_pf"),
        dsum(col("priority_fee") * col("priority_fee")).as("sum_pf2"))
      .withColumn("avg_pf", col("sum_pf") / col("n_txs"))
      .withColumn("sd_pf", sqrt(greatest(
        col("sum_pf2") / col("n_txs") - col("avg_pf") * col("avg_pf"), lit(0.0))))
      .select("s_block", "avg_pf", "sd_pf")
    txs.join(stats, col("block_number") === col("s_block"))
      .withColumn("high_priority_fee",
        (col("priority_fee") > col("avg_pf") + lit(DiscoveryStdDevs) * col("sd_pf"))
          .cast("int"))
      .filter(col("coinbase_transfer") === 1 || col("high_priority_fee") === 1)
      .join(claimed.select("tx_hash").distinct(), Seq("tx_hash"), "left_anti")
      .select("block_number", "tx_idx", "tx_hash", "priority_fee",
        "is_private", "coinbase_transfer", "high_priority_fee")
  }

  /** Q9 (possible-MEV surface): the MevBlock's `possible_mev` collection —
    * unclaimed txs that look like missed MEV. Per-tx signals come off the
    * trace scan (root-trace priority fee, any payment to the block
    * beneficiary); the private-mempool label is a deterministic md5 draw
    * (the reference reads an indexed-mempool dimension, metadata we model
    * like the searcher label set). The claimed set unions every bundle's
    * tx hashes — sandwich front/back/victims (sandwich.rs:137-142), JIT
    * mint+burn, liquidations, arbs. Scale shape: block-keyed equi-joins
    * only; the claimed side is a semi-join fed by the already-materialized
    * bundle tables. */
  private val q9PossibleMev = QueryDef(
    "q9_possible_mev",
    (s, dir) => {
      val t = tracesTable(s, dir)
      val b = blocks(s, dir).select(col("block_number").as("b_block"),
        col("beneficiary"))
      val perTx = t.join(broadcast(b), col("block_number") === col("b_block"))
        .groupBy("block_number", "tx_idx", "tx_hash")
        .agg(min_by(col("priority_fee"), col("trace_idx")).as("priority_fee"),
          max(when(col("to_address") === col("beneficiary"), 1).otherwise(0))
            .as("coinbase_transfer"))
        .withColumn("is_private",
          (substring(md5(concat(lit("priv:"), col("tx_hash"))), 1, 1) <= "3")
            .cast("int"))
      val sd = sandwiches(s, dir)
      val victims = sd.select(col("wnd").as("s_wnd"), col("pool").as("s_pool"),
          col("dir").as("s_dir"), col("eoa").as("s_eoa"),
          col("front_ord"), col("back_ord"))
        .join(windowed(swTx(s, dir)),
          col("wnd") === col("s_wnd") && col("pool") === col("s_pool") &&
            col("dir") === col("s_dir") && col("eoa") =!= col("s_eoa") &&
            col("ord") > col("front_ord") && col("ord") < col("back_ord"))
        .select("tx_hash")
      val claimed = sd.select(col("front_tx").as("tx_hash"))
        .unionByName(sd.select(col("back_tx").as("tx_hash")))
        .unionByName(victims)
        .unionByName(jitPairs(s, dir).select("tx_hash"))
        .unionByName(jitPairs(s, dir).select(col("burn_tx").as("tx_hash")))
        .unionByName(actionsTable(s, dir)
          .filter(col("action_type") === "liquidation").select("tx_hash"))
        .unionByName(arbs(s, dir).select("tx_hash"))
      possibleMevOf(perTx, claimed).orderBy("tx_hash")
    },
    withCtes(s"""$sandwichCtes, $arbCte, $jitpCte,
      pm_tx AS (
        SELECT t.block_number, t.tx_idx, t.tx_hash,
          ARG_MIN(t.priority_fee, t.trace_idx) AS priority_fee,
          MAX(CASE WHEN t.to_address = b.beneficiary THEN 1 ELSE 0 END)
            AS coinbase_transfer
        FROM trace t JOIN blocks b ON t.block_number = b.block_number
        GROUP BY 1, 2, 3),
      pm_stat AS (
        SELECT block_number AS s_block, COUNT(*) AS n_txs,
          ${sqlSum("priority_fee")} AS sum_pf,
          ${sqlSum("priority_fee * priority_fee")} AS sum_pf2
        FROM pm_tx GROUP BY 1),
      pm_claimed AS (
        SELECT front_tx AS tx_hash FROM sand
        UNION SELECT back_tx FROM sand
        UNION SELECT v.tx_hash FROM sand sx JOIN sw_w v
          ON v.wnd = sx.wnd AND v.pool = sx.pool AND v.dir = sx.dir
         AND v.eoa <> sx.eoa AND v.ord > sx.front_ord AND v.ord < sx.back_ord
        UNION SELECT tx_hash FROM jitp
        UNION SELECT burn_tx FROM jitp
        UNION SELECT DISTINCT tx_hash FROM actions WHERE action_type = 'liquidation'
        UNION SELECT tx_hash FROM arb)
      SELECT p.block_number, p.tx_idx, p.tx_hash, p.priority_fee,
        CAST(substr(md5('priv:' || p.tx_hash), 1, 1) <= '3' AS INTEGER) AS is_private,
        p.coinbase_transfer,
        CAST(p.priority_fee > sum_pf / n_txs + $DiscoveryStdDevs *
          sqrt(GREATEST(sum_pf2 / n_txs - (sum_pf / n_txs) * (sum_pf / n_txs),
            0.0e0)) AS INTEGER) AS high_priority_fee
      FROM pm_tx p JOIN pm_stat st ON p.block_number = st.s_block
      WHERE (p.coinbase_transfer = 1
             OR p.priority_fee > sum_pf / n_txs + $DiscoveryStdDevs *
               sqrt(GREATEST(sum_pf2 / n_txs - (sum_pf / n_txs) * (sum_pf / n_txs),
                 0.0e0)))
        AND p.tx_hash NOT IN (SELECT tx_hash FROM pm_claimed)
      ORDER BY p.tx_hash"""))

  /** The builder/proposer block-PnL core (`calculate_builder_profit` +
    * `pre_process`, composer/utils.rs:199-443), DataFrame-parameterized
    * for the golden battery. Per block:
    *   - totals over per-tx ROOT gas details: Σ gas_used,
    *     Σ priority_fee·gas_used, Σ coinbase value (utils.rs:405-443)
    *   - proposer payment: the block's LAST tx, when its root action is a
    *     native transfer from the builder (or the ultrasound collateral
    *     address — that match sets bid_adjusted) or to the proposer fee
    *     recipient, pays its value to the proposer; otherwise the
    *     relay-metadata fallback reward applies (utils.rs:307-332)
    *   - sponsorship: builder→address transfers count only when that
    *     address paid the builder MORE (priority fee + coinbase) than it
    *     received, and never to the proposer recipient (utils.rs:359-403)
    *   - builder_eth_profit = priority fees + bribes − sponsorship −
    *     proposer reward (utils.rs:296-297)
    *   - vertically-integrated searchers: bundle profit (SearcherTx-type
    *     profit excluded) + gas tips from the builder's own searcher set
    *     (utils.rs:334-357).
    * Shapes: `perTx`(block_number, tx_idx, eoa, gas_used, priority_fee,
    * coinbase_value), `ethXfer`(block_number, tx_idx, from_address,
    * to_address, value, is_root), `meta`(block_number, beneficiary,
    * proposer_recipient, fallback_reward, collateral), `bundles`
    * (block_number, eoa, profit_usd, gas_paid, mev_type),
    * `builderSearchers`(builder_addr, s_eoa). */
  private[graft] def builderPnlOf(perTx: DataFrame, ethXfer: DataFrame,
      bundles: DataFrame, meta: DataFrame, builderSearchers: DataFrame): DataFrame = {
    val tot = perTx.groupBy("block_number")
      .agg(sum(col("gas_used")).as("total_gas_used"),
        sum(col("priority_fee") * col("gas_used")).as("total_priority_fee"),
        sum(col("coinbase_value")).as("total_bribe"),
        max(col("tx_idx")).as("last_idx"))
    val lastX = ethXfer.filter(col("is_root") === 1)
      .join(tot.select(col("block_number").as("l_block"), col("last_idx")),
        col("block_number") === col("l_block") && col("tx_idx") === col("last_idx"))
      .join(meta.select(col("block_number").as("m_block"), col("beneficiary"),
          col("proposer_recipient").as("m_recipient"), col("collateral")),
        col("block_number") === col("m_block"))
      .filter(col("from_address") === col("beneficiary") ||
        col("from_address") <=> col("collateral") ||
        col("to_address") === col("m_recipient"))
      .select(col("block_number").as("p_block"), col("value").as("tree_reward"),
        col("to_address").as("tree_recipient"),
        (col("from_address") <=> col("collateral")).cast("int").as("tree_adjusted"))
    val prop = meta.join(lastX, col("block_number") === col("p_block"), "left")
      .select(col("block_number"), col("beneficiary"), col("collateral"),
        coalesce(col("tree_reward"), col("fallback_reward")).as("proposer_reward"),
        coalesce(col("tree_recipient"), col("proposer_recipient")).as("proposer_recipient"),
        coalesce(col("tree_adjusted"), lit(0)).as("bid_adjusted"))
    val paidBy = perTx.groupBy(col("block_number").as("g_block"), col("eoa"))
      .agg((sum(col("priority_fee")) + sum(col("coinbase_value"))).as("total_paid"))
    val spons = ethXfer
      .join(prop.select(col("block_number").as("s_block"),
          col("beneficiary").as("s_builder"),
          col("proposer_recipient").as("s_recipient")),
        col("block_number") === col("s_block"))
      .filter(col("from_address") === col("s_builder") &&
        col("to_address") =!= col("s_recipient"))
      .join(paidBy, col("block_number") === col("g_block") &&
        col("to_address") === col("eoa"), "left")
      .withColumn("amt", when(coalesce(col("total_paid"), lit(0L)) > col("value"),
        col("value")).otherwise(lit(0L)))
      .groupBy(col("block_number").as("x_block"))
      .agg(sum(col("amt")).as("sponsorship"))
    val vert = bundles
      .join(meta.select(col("block_number").as("v_block"),
          col("beneficiary").as("v_builder")),
        col("block_number") === col("v_block"))
      .join(builderSearchers, col("builder_addr") === col("v_builder") &&
        col("s_eoa") === col("eoa"), "left_semi")
      .groupBy(col("block_number").as("b_block"))
      .agg(dsumR(when(col("mev_type") =!= "searcher_tx", col("profit_usd"))
          .otherwise(lit(0.0))).as("builder_mev_profit_usd"),
        dsumR(col("gas_paid")).as("searcher_tip_usd"))
    prop.join(tot.drop("last_idx"), Seq("block_number"))
      .join(spons, col("block_number") === col("x_block"), "left")
      .join(vert, col("block_number") === col("b_block"), "left")
      .select(col("block_number"), col("beneficiary"), col("total_gas_used"),
        col("total_priority_fee"), col("total_bribe"),
        col("proposer_reward"), col("proposer_recipient"), col("bid_adjusted"),
        coalesce(col("sponsorship"), lit(0L)).as("sponsorship"),
        (col("total_priority_fee") + col("total_bribe") -
          coalesce(col("sponsorship"), lit(0L)) - col("proposer_reward"))
          .as("builder_eth_profit"),
        coalesce(col("builder_mev_profit_usd"), lit(0.0)).as("builder_mev_profit_usd"),
        coalesce(col("searcher_tip_usd"), lit(0.0)).as("searcher_tip_usd"))
  }

  /** Q9 (builder PnL surface): the MevBlock header's builder/proposer
    * economics over the fixture chain. Root gas details come off the
    * trace scan (root-trace fee, coinbase value = the builder-payment
    * frame's q6); relay metadata is a deterministic per-block dimension
    * (the reference reads mev-boost relay data — the fixture has no
    * builder-originated native transfers, so the proposer reward always
    * takes the relay-fallback arm and sponsorship is structurally zero;
    * the tree-payment, bid-adjustment, and sponsorship-gating arms are
    * pinned by the golden battery). Vertically-integrated searcher PnL
    * attributes each block's typed bundles (j10's candidate set × A3
    * header) to the builder owning that searcher EOA. All joins are
    * block-keyed equi-joins; dimensions broadcast. */
  private val q9BuilderPnl = QueryDef(
    "q9_builder_pnl",
    (s, dir) => {
      val t = tracesTable(s, dir)
      val b = blocks(s, dir)
      val perTx = t.join(broadcast(b.select(col("block_number").as("bb"),
          col("beneficiary").as("ben"))), col("block_number") === col("bb"))
        .groupBy(col("block_number"), col("tx_idx"),
          col("from_address").as("eoa"))
        .agg(min_by(col("gas_used"), col("trace_idx")).as("gas_used"),
          min_by(col("priority_fee"), col("trace_idx")).as("priority_fee"),
          sum(when(col("to_address") === col("ben"), col("q6").cast("long"))
            .otherwise(lit(0L))).as("coinbase_value"))
      val meta = b.select(col("block_number"), col("beneficiary"),
        md5(concat(lit("proposer:"), col("block_number") % 8)).as("proposer_recipient"),
        ((col("block_number") % 97 + 1) * 1000000L).as("fallback_reward"),
        lit(null).cast("string").as("collateral"))
      val hdr = bundleHeaders(s, dir)
      val cand = jitPairs(s, dir).select(col("tx_hash"),
          lit("jit").as("mev_type"))
        .unionByName(actionsTable(s, dir)
          .filter(col("action_type") === "liquidation")
          .select("tx_hash").distinct()
          .withColumn("mev_type", lit("liquidation")))
        .unionByName(arbs(s, dir).select(col("tx_hash"),
          lit("arb").as("mev_type")))
      val bundles = cand.join(hdr, "tx_hash")
        .select(col("block_number"), col("eoa"), col("profit_usd"),
          col("gas_usd").as("gas_paid"), col("mev_type"))
      val bs = s.range(NumSearchers).select(
        md5(concat(lit("builder:"), col("id") % NumBuilders)).as("builder_addr"),
        md5(concat(lit("eoa:"), col("id"))).as("s_eoa"))
      val ethXfer = s.emptyDataFrame
        .select(lit(0L).as("block_number"), lit(0L).as("tx_idx"),
          lit("").as("from_address"), lit("").as("to_address"),
          lit(0L).as("value"), lit(0).as("is_root")).limit(0)
      builderPnlOf(perTx, ethXfer, bundles, meta, broadcast(bs))
        .orderBy("block_number")
    },
    withCtes(s"""$arbCte, $jitpCte,
      bp_tx AS (
        SELECT t.block_number, t.tx_idx, t.from_address AS eoa,
          ARG_MIN(t.gas_used, t.trace_idx) AS gas_used,
          ARG_MIN(t.priority_fee, t.trace_idx) AS priority_fee,
          SUM(CASE WHEN t.to_address = b.beneficiary THEN t.q6 ELSE 0 END)
            AS coinbase_value
        FROM trace t JOIN blocks b ON t.block_number = b.block_number
        GROUP BY 1, 2, 3),
      bp_tot AS (
        SELECT block_number,
          CAST(SUM(gas_used) AS BIGINT) AS total_gas_used,
          CAST(SUM(priority_fee * gas_used) AS BIGINT) AS total_priority_fee,
          CAST(SUM(coinbase_value) AS BIGINT) AS total_bribe
        FROM bp_tx GROUP BY 1),
      bp_meta AS (
        SELECT block_number, beneficiary,
          md5('proposer:' || block_number % 8) AS proposer_recipient,
          (block_number % 97 + 1) * 1000000 AS fallback_reward
        FROM blocks),
      bp_bundles AS (
        SELECT h.block_number, h.eoa, h.profit_usd, h.gas_usd AS gas_paid,
          c.mev_type
        FROM (SELECT tx_hash, 'jit' AS mev_type FROM jitp
              UNION ALL SELECT DISTINCT tx_hash, 'liquidation' FROM actions
                WHERE action_type = 'liquidation'
              UNION ALL SELECT tx_hash, 'arb' FROM arb) c
        JOIN header h ON c.tx_hash = h.tx_hash),
      bp_bs AS (
        SELECT md5('builder:' || (i % $NumBuilders)) AS builder_addr,
          md5('eoa:' || i) AS s_eoa
        FROM range($NumSearchers) t(i)),
      bp_vert AS (
        SELECT bb.block_number,
          ${sqlSumR("CASE WHEN bb.mev_type <> 'searcher_tx' THEN bb.profit_usd ELSE 0.0e0 END")}
            AS builder_mev_profit_usd,
          ${sqlSumR("bb.gas_paid")} AS searcher_tip_usd
        FROM bp_bundles bb
        JOIN bp_meta m ON bb.block_number = m.block_number
        WHERE EXISTS (SELECT 1 FROM bp_bs s
          WHERE s.builder_addr = m.beneficiary AND s.s_eoa = bb.eoa)
        GROUP BY 1)
      SELECT m.block_number, m.beneficiary, t.total_gas_used,
        t.total_priority_fee, t.total_bribe,
        CAST(m.fallback_reward AS BIGINT) AS proposer_reward,
        m.proposer_recipient,
        0 AS bid_adjusted,
        CAST(0 AS BIGINT) AS sponsorship,
        CAST(t.total_priority_fee + t.total_bribe - m.fallback_reward AS BIGINT)
          AS builder_eth_profit,
        COALESCE(v.builder_mev_profit_usd, 0.0e0) AS builder_mev_profit_usd,
        COALESCE(v.searcher_tip_usd, 0.0e0) AS searcher_tip_usd
      FROM bp_meta m
      JOIN bp_tot t ON m.block_number = t.block_number
      LEFT JOIN bp_vert v ON m.block_number = v.block_number
      ORDER BY m.block_number"""))

  /** The composer's final bundle filter + count (`filter_and_count_bundles`,
    * composer/utils.rs:149-180): Sandwich and AtomicArb bundles survive
    * only when profitable OR when no pricing was calculated (the
    * unpriced-token arm — a loss that might be a pricing artifact is
    * kept for review); every other MEV type passes unfiltered. Input rows
    * carry (mev_type, profit_usd, no_pricing); output is the MevCount
    * table per type. DataFrame-parameterized for the golden battery. */
  private[graft] def filterCountBundlesOf(bundles: DataFrame): DataFrame =
    bundles.withColumn("kept",
        when(col("mev_type").isin("sandwich", "arb"),
          (col("profit_usd") > 0) || col("no_pricing") === 1)
          .otherwise(lit(true)))
      .groupBy("mev_type")
      .agg(count(lit(1)).as("n_raw"),
        sum(col("kept").cast("long")).as("n_final"),
        dsumR(when(col("kept"), col("profit_usd")).otherwise(lit(0.0)))
          .as("sum_profit_final"))
      .orderBy("mev_type")

  /** Q9 (MevCount surface): the filtered per-type bundle census feeding
    * the MevBlock header. Sandwich profit is the front+back header PnL;
    * a bundle is unpriced when any of its txs touches a quarantined
    * token (the has_dex_price analog of `no_pricing_calculated`). */
  private val q9MevCount = QueryDef(
    "q9_mev_count",
    (s, dir) => {
      val hdr = bundleHeaders(s, dir)
        .select(col("tx_hash"), col("profit_usd"))
      val unp = unpricedTxs(actionsTable(s, dir)).withColumn("unp", lit(1))
      def flag(df: DataFrame, tx: String): DataFrame = df
        .join(unp.select(col("tx_hash").as(s"u_$tx"), col("unp").as(s"unp_$tx")),
          col(tx) === col(s"u_$tx"), "left")
      val sand = flag(flag(sandwiches(s, dir)
          .join(hdr.select(col("tx_hash").as("front_tx"),
            col("profit_usd").as("front_profit")), "front_tx")
          .join(hdr.select(col("tx_hash").as("back_tx"),
            col("profit_usd").as("back_profit")), "back_tx"),
          "front_tx"), "back_tx")
        .select(lit("sandwich").as("mev_type"),
          (col("front_profit") + col("back_profit")).as("profit_usd"),
          (coalesce(col("unp_front_tx"), lit(0)) +
            coalesce(col("unp_back_tx"), lit(0)) > 0).cast("int").as("no_pricing"))
      def perTx(src: DataFrame, t: String): DataFrame = src
        .join(hdr, "tx_hash")
        .join(unp.select(col("tx_hash"), col("unp")), Seq("tx_hash"), "left")
        .select(lit(t).as("mev_type"), col("profit_usd"),
          coalesce(col("unp"), lit(0)).as("no_pricing"))
      val arb = perTx(arbs(s, dir).select("tx_hash"), "arb")
      val jit = perTx(jitPairs(s, dir).select("tx_hash"), "jit")
      val liq = perTx(actionsTable(s, dir)
        .filter(col("action_type") === "liquidation")
        .select("tx_hash").distinct(), "liquidation")
      filterCountBundlesOf(sand.unionByName(arb).unionByName(jit).unionByName(liq))
    },
    withCtes(s"""$sandwichCtes, $arbCte, $jitpCte,
      fc_unp AS (
        SELECT DISTINCT tx_hash FROM actions
        WHERE (token_in_id IS NOT NULL AND dec_in IS NULL)
           OR (token_out_id IS NOT NULL AND dec_out IS NULL)),
      fc_bundles AS (
        SELECT 'sandwich' AS mev_type,
          hf.profit_usd + hb.profit_usd AS profit_usd,
          CASE WHEN uf.tx_hash IS NOT NULL OR ub.tx_hash IS NOT NULL
            THEN 1 ELSE 0 END AS no_pricing
        FROM sand s2
        JOIN header hf ON s2.front_tx = hf.tx_hash
        JOIN header hb ON s2.back_tx = hb.tx_hash
        LEFT JOIN fc_unp uf ON s2.front_tx = uf.tx_hash
        LEFT JOIN fc_unp ub ON s2.back_tx = ub.tx_hash
        UNION ALL
        SELECT t.mev_type, h.profit_usd,
          CASE WHEN u.tx_hash IS NOT NULL THEN 1 ELSE 0 END
        FROM (SELECT tx_hash, 'arb' AS mev_type FROM arb
              UNION ALL SELECT tx_hash, 'jit' FROM jitp
              UNION ALL SELECT DISTINCT tx_hash, 'liquidation' FROM actions
                WHERE action_type = 'liquidation') t
        JOIN header h ON t.tx_hash = h.tx_hash
        LEFT JOIN fc_unp u ON t.tx_hash = u.tx_hash)
      SELECT mev_type, COUNT(*) AS n_raw,
        CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
        ${sqlSumR("CASE WHEN kept THEN profit_usd ELSE 0.0e0 END")}
          AS sum_profit_final
      FROM (SELECT *,
        CASE WHEN mev_type IN ('sandwich', 'arb')
          THEN profit_usd > 0 OR no_pricing = 1 ELSE true END AS kept
        FROM fc_bundles)
      GROUP BY 1 ORDER BY 1"""))

  /** W3: the bounded shrink loop's per-round yield — how many verified
    * sandwiches were found at each shrink depth (0 = no shrink needed).
    * Q1 consumes the same [[sandwichesOf]] machinery; this query reports
    * the loop's convergence profile, oracle-checked against the generated
    * round CTEs. */
  private val w3ShrinkLoop = QueryDef(
    "w3_shrink_loop",
    (s, dir) => sandwiches(s, dir)
      .groupBy("found_at_iter")
      .agg(count(lit(1)).as("n_valid"), sum(col("n_victims")).as("n_victims"))
      .orderBy("found_at_iter"),
    withCtes(s"""$sandwichCtes
      SELECT found_at_iter, COUNT(*) AS n_valid,
        CAST(SUM(n_victims) AS BIGINT) AS n_victims
      FROM sand GROUP BY 1 ORDER BY 1"""))

  /** J6 at block_window = 3: the same bracket machinery through the
    * PARAMETERIZED window expansion ([[windowed]]; the reference declares
    * `block_window()` per inspector, brontes-inspect/src/lib.rs:94) —
    * proving the explode count scales with `w` instead of a hardcoded
    * 2-block pair. Span-2 brackets (front two blocks before the back) are
    * exactly the finds a 2-block window cannot see. */
  private val j6BracketW3 = QueryDef(
    "j6_bracket_w3",
    (s, dir) => bracketsOf(swTx(s, dir), 3)
      .groupBy(col("back_block").as("block_number"))
      .agg(count(lit(1)).as("n_brackets"),
        sum(when(col("back_block") - col("front_block") === 1, 1L)
          .otherwise(0L)).as("n_span1"),
        sum(when(col("back_block") - col("front_block") === 2, 1L)
          .otherwise(0L)).as("n_span2"),
        sum(col("valid_pricing").cast("long")).as("n_valid_pricing"))
      .orderBy("block_number"),
    withCtes(s"""$swTxCte,
      ${swWCte.replace("sw_w AS", "sw_w3 AS")
        .replace("unnest([block_number, block_number + 1])",
          "unnest(generate_series(block_number, block_number + 2))")},
      ${brktCte.replace("brkt AS", "brkt3 AS").replace("FROM sw_w", "FROM sw_w3")}
      SELECT back_block AS block_number, COUNT(*) AS n_brackets,
        CAST(SUM(CASE WHEN back_block - front_block = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_span1,
        CAST(SUM(CASE WHEN back_block - front_block = 2 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_span2,
        CAST(SUM(CASE WHEN valid_pricing THEN 1 ELSE 0 END) AS BIGINT)
          AS n_valid_pricing
      FROM brkt3 GROUP BY 1 ORDER BY 1"""))

  /** A1→A3 at DECIMAL precision — the SURVEY §1.2 stance demonstrated
    * end-to-end: token deltas, USD valuation, gas, and profit computed in
    * EXACT decimal arithmetic with NO floating-point op anywhere on the
    * path. Per-row amounts are recovered as integer micro-units
    * (`ROUND(amount × 1e6)` — exact: every fixture amount is a 6-dp
    * decimal), prices are exact decimals (1 + id/10), and every
    * multiply/add keeps precision ≤ 38 so neither engine rounds. Outputs
    * are cast to DECIMAL(38,18) on both sides so the scales (and hence
    * string forms) agree exactly. */
  private val a1DeltaDecimal = QueryDef(
    "a1_delta_decimal",
    (s, dir) => {
      val a = actionsTable(s, dir)
      val micro6 = "CAST(0.000001 AS DECIMAL(7,6))"
      val inLeg = a.filter(col("token_in_id").isNotNull &&
          col("amount_in").isNotNull &&
          col("action_type").isin("swap", "transfer", "mint", "burn", "liquidation"))
        .select(col("block_number"), col("tx_hash"),
          col("token_in_id").as("token_id"),
          (when(col("action_type") === "burn", lit(1)).otherwise(lit(-1)) *
            expr(s"CAST(ROUND(amount_in * 1000000.0e0) AS DECIMAL(12,0)) * $micro6"))
            .as("delta_dec"))
      val outLeg = a.filter(col("token_out_id").isNotNull &&
          col("amount_out").isNotNull &&
          col("action_type").isin("swap", "mint", "burn", "liquidation"))
        .select(col("block_number"), col("tx_hash"),
          col("token_out_id").as("token_id"),
          (when(col("action_type") === "mint", lit(-1)).otherwise(lit(1)) *
            expr(s"CAST(ROUND(amount_out * 1000000.0e0) AS DECIMAL(12,0)) * $micro6"))
            .as("delta_dec"))
      val rev = inLeg.unionByName(outLeg)
        .withColumn("price_dec", expr(
          """CAST(1 AS DECIMAL(2,0)) +
             CAST(token_id AS DECIMAL(2,0)) * CAST(0.1 AS DECIMAL(2,1))"""))
        .groupBy("block_number", "tx_hash")
        // exact downcast (per-tx revenue < 1e13): pins a common narrow
        // scale so the block-level subtraction stays inside width 38 on
        // BOTH engines (DuckDB errors past 38; Spark silently rounds)
        .agg(sum(col("delta_dec") * col("price_dec"))
          .cast("decimal(20,7)").as("rev_dec"))
      // gas_usd = wei × EthUsd / 1e9 = wei × (EthUsd/1000) × 1e-6 — exact
      // at scale 6 because EthUsd is a whole multiple of 1000
      val gas = tracesTable(s, dir)
        .join(broadcast(blocks(s, dir)
          .select(col("block_number").as("b_block"), col("base_fee"))),
          col("block_number") === col("b_block"))
        .groupBy("block_number", "tx_hash")
        .agg(expr(s"""CAST(SUM(gas_used * (priority_fee + base_fee)) *
            ${(Accounting.EthUsd / 1000).toLong} AS DECIMAL(14,0)) *
            CAST(0.000001 AS DECIMAL(7,6))""").as("gas_dec"))
      gas.join(rev, Seq("block_number", "tx_hash"), "left")
        .withColumn("rev_dec",
          coalesce(col("rev_dec"), expr("CAST(0 AS DECIMAL(20,7))")))
        .groupBy("block_number")
        .agg(count(lit(1)).as("n_txs"),
          sum(col("rev_dec")).as("sum_rev"),
          sum(col("gas_dec")).as("sum_gas"),
          sum(col("rev_dec") - col("gas_dec")).as("sum_profit"))
        // emitted as the DECIMAL(38,18) STRING form: python-side readers
        // coerce decimals inconsistently (pandas object vs float64), so
        // the exact fixed-scale text is the stable comparison surface
        .select(col("block_number"), col("n_txs"),
          col("sum_rev").cast("decimal(38,18)").cast("string")
            .as("sum_revenue_usd"),
          col("sum_gas").cast("decimal(38,18)").cast("string")
            .as("sum_gas_usd"),
          col("sum_profit").cast("decimal(38,18)").cast("string")
            .as("sum_profit_usd"))
        .orderBy("block_number")
    },
    withCtes(s""" dd_in AS (
        SELECT block_number, tx_hash, token_in_id AS token_id,
          (CASE WHEN action_type = 'burn' THEN 1 ELSE -1 END) *
            CAST(ROUND(amount_in * 1000000.0e0) AS DECIMAL(12,0)) *
            CAST(0.000001 AS DECIMAL(7,6)) AS delta_dec
        FROM actions
        WHERE token_in_id IS NOT NULL AND amount_in IS NOT NULL
          AND action_type IN ('swap','transfer','mint','burn','liquidation')),
      dd_out AS (
        SELECT block_number, tx_hash, token_out_id,
          (CASE WHEN action_type = 'mint' THEN -1 ELSE 1 END) *
            CAST(ROUND(amount_out * 1000000.0e0) AS DECIMAL(12,0)) *
            CAST(0.000001 AS DECIMAL(7,6)) AS delta_dec
        FROM actions
        WHERE token_out_id IS NOT NULL AND amount_out IS NOT NULL
          AND action_type IN ('swap','mint','burn','liquidation')),
      dd_rev AS (
        SELECT block_number, tx_hash,
          CAST(SUM(delta_dec * (CAST(1 AS DECIMAL(2,0)) +
            CAST(token_id AS DECIMAL(2,0)) * CAST(0.1 AS DECIMAL(2,1))))
            AS DECIMAL(20,7)) AS rev_dec
        FROM (SELECT * FROM dd_in UNION ALL SELECT * FROM dd_out)
        GROUP BY 1, 2),
      dd_gas AS (
        SELECT t.block_number, t.tx_hash,
          CAST(SUM(t.gas_used * (t.priority_fee + b.base_fee)) *
            ${(Accounting.EthUsd / 1000).toLong} AS DECIMAL(14,0)) *
            CAST(0.000001 AS DECIMAL(7,6)) AS gas_dec
        FROM trace t JOIN blocks b ON t.block_number = b.block_number
        GROUP BY 1, 2)
      SELECT g.block_number, COUNT(*) AS n_txs,
        CAST(CAST(SUM(COALESCE(r.rev_dec, CAST(0 AS DECIMAL(20,7))))
          AS DECIMAL(38,18)) AS VARCHAR) AS sum_revenue_usd,
        CAST(CAST(SUM(g.gas_dec) AS DECIMAL(38,18)) AS VARCHAR) AS sum_gas_usd,
        CAST(CAST(SUM(COALESCE(r.rev_dec, CAST(0 AS DECIMAL(20,7))) - g.gas_dec)
          AS DECIMAL(38,18)) AS VARCHAR) AS sum_profit_usd
      FROM dd_gas g LEFT JOIN dd_rev r
        ON g.block_number = r.block_number AND g.tx_hash = r.tx_hash
      GROUP BY 1 ORDER BY 1"""))
}
