package graft.domain

import graft.{QueryDef, QueryModule}
import graft.ops.ExactAgg._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q1 "Big Mac" multi-frontrun sandwich assembly — the reference's full
  * `PossibleSandwich{possible_frontruns: Vec, victims: Vec<Vec>}` shape
  * (sandwich/mod.rs:851-1148), which the single-bracket machinery in
  * [[InspectorOps]] cannot express: a searcher stacking N frontruns with
  * per-gap victim sets must assemble into ONE bundle, not N-1 overlapping
  * 2-tx brackets (golden test `test_big_mac_sandwich`, mod.rs:1149-1510).
  *
  * Candidate assembly mirrors both reference keyings per block (the
  * reference walks one block's tx_roots):
  *   - duplicate SENDERS (mod.rs:1014-1070): chain a sender's swap txs in
  *     tx order; each consecutive pair is a link whose gap victims are all
  *     universe txs strictly between.
  *   - duplicate CONTRACTS (mod.rs:1076-1135): the same chain keyed by the
  *     tx's root `to` contract; the bundle's EOA is the first caller's.
  * `partition_into_gaps` (mod.rs:903-952): an EMPTY gap splits the chain —
  * the frontrun after the split's gap is PROMOTED to backrun of the left
  * segment. Segments carry the reference's size caps (≤10 gaps, ≤30 total
  * victims, mod.rs:893-897) and its victim-set nullification: a gap victim
  * whose root call targets the chain's mev contract kills the candidate
  * (get_victim_swap_transfer, mod.rs:989-1009).
  *
  * Verification is the per-GAP pool-overlap of `has_pool_overlap` /
  * `verify_sandwich_victims` (mod.rs:556-701), fixture-scaled to pool
  * grain: victims group by EOA; a victim-EOA "was victimized" in gap g of
  * range [i,j] iff one of its pools is touched by a searcher tx at a
  * position ≤ g (front side) AND at a position ≥ g+1 (back side); every
  * gap needs ≥ 1 victimized EOA (`has_sandwich`) and ≥ 25% victimized
  * (`victim_pct >= 0.25`, [[InspectorOps.MinVictimRatioDen]]).
  *
  * The shrink recursion (`recursive_possible_sandwiches`,
  * mod.rs:447-555) becomes a 6-level reachability recurrence over
  * contiguous link ranges: a failing range of ≥ 2 frontruns spawns its
  * front-shrink (drop first frontrun + first gap) and back-shrink (drop
  * last gap, POP the last frontrun and promote it to backrun — the exact
  * boundary semantics [[InspectorOps.sandwichesOf]] documents as its
  * divergence); a range is emitted iff it verifies and some all-failing
  * shrink path reaches it (bounded at 6 drops, mod.rs:462-464). Pricing
  * does not gate emission — as in the reference, `valid_pricing` failure
  * zeroes `profit_usd` and clears `has_dex_price` (mod.rs:322-347).
  *
  * Fixture-scale adaptations (documented, both engines identical): the
  * chain/link/segment universe is the swap-tx set (`sw_tx`), the chain's
  * mev contract is the root `to` of the segment's second tx (the
  * reference captures it when the first repeat creates the
  * PossibleSandwich), and the contract-keyed EOA is the segment's first
  * caller. Victim verification carries BOTH reference overlap arms:
  * pool-level reach, plus the transfer-victim / token-overlap fallbacks
  * (`get_victim_swap_transfer` mod.rs:989-1009, `check_for_overlap`
  * tokens arm mod.rs:701-760) — see [[bigmacBundlesOf]].
  *
  * Scale shape: every step is equi-keyed on (block, keying, key[, seg]) —
  * a 100 TB backfill parallelizes by block; range enumeration is bounded
  * by the reference's own ≤10-gap / ≤6-drop caps, so per-segment work is
  * O(1) and nothing is ever joined across blocks.
  */
object BigMacOps extends QueryModule {

  import ChainFixture._
  import InspectorOps.{MaxPriceDiff, MinVictimRatioDen, ShrinkRounds}

  def defs: Seq[QueryDef] = Seq(q1Bigmac)

  private def withCtes(sql: String) =
    Some(s"WITH ${Accounting.sqlDomainCtes}, $sql")

  private val segKeys = Seq("block_number", "ktype", "k", "seg")

  /** The shrink-reachability recursion as one SQL array expression over a
    * per-segment `rs: array<struct<i,j,m,ok>>` column: level 0 is the full
    * range [1,m]; a failing level-d range of ≥ 2 links spawns its
    * front-drop (i+1,j) and back-drop (i,j-1) children at level d+1; the
    * result is every `ok` range reached within `rounds` drops. Stepped via
    * aggregate() so each level's array is MATERIALIZED in the accumulator
    * (naively nesting the levels as filter/exists lambdas re-evaluates the
    * whole inner level per outer element — O(n^rounds) per segment).
    * Property-tested against a direct BFS in BigMacShrinkSpec. */
  private[graft] def shrinkEmitExpr(rounds: Int): String =
    s"""aggregate(
      sequence(1, $rounds),
      named_struct(
        'lvl', filter(rs, r -> r.i = 1 AND r.j = r.m),
        'em', filter(rs, r -> false)),
      (acc, d) -> named_struct(
        'lvl', filter(rs, r -> exists(acc.lvl, p ->
          (NOT p.ok) AND p.j - p.i + 1 >= 2 AND
          ((r.i = p.i + 1 AND r.j = p.j) OR (r.i = p.i AND r.j = p.j - 1)))),
        'em', concat(acc.em, filter(acc.lvl, r -> r.ok))),
      acc -> concat(acc.em, filter(acc.lvl, r -> r.ok)))"""

  /** Root `to` contract per tx (trace_idx = 1 is the root frame). */
  private[domain] def rootTo(s: SparkSession, dir: String): DataFrame =
    actionsTable(s, dir)
      .groupBy("block_number", "tx_idx")
      .agg(min_by(col("to_address"), col("trace_idx")).as("root_to"))

  /** The full assembly on any swTx-shaped frame (block_number, tx_idx,
    * tx_hash, eoa, pool, tok_in, tok_out, sum_in, sum_out) plus a per-tx
    * (block_number, tx_idx, root_to) frame and a per-tx profit lookup
    * (tx_hash, profit_usd). Unit-testable on planted ladders.
    *
    * `transfersDf` (optional, tx-grain transfer legs: block_number,
    * tx_idx, eoa, token, direction) enables the reference's three victim
    * fallbacks:
    *   - TRANSFER-ONLY victims (`get_victim_swap_transfer`,
    *     sandwich/mod.rs:989-1009, harvest `:127`): a gap tx with no swap
    *     still joins the victim-EOA universe through its transfer legs —
    *     and is subject to the same mev-contract nullification;
    *   - TOKEN-level overlap (`check_for_overlap`'s matched_tokens arm,
    *     mod.rs:701-760): a victim EOA counts as victimized when one of
    *     its transferred TOKENS is touched by a searcher position on the
    *     front side (≤ g) AND the back side (≥ g+1), even with no pool
    *     overlap. Fixture-scale adaptation (identical in both engines):
    *     the searcher side's token set is its swap legs' {tok_in,
    *     tok_out}, the victim side's is its transfer legs' tokens, and
    *     the front/back direction flags collapse into the position test;
    *   - GENERATED pools (`generate_possible_pools_from_transfers`,
    *     mod.rs:819-838): a tx with EXACTLY two transfer legs of
    *     different tokens in opposite directions is an unclassified-pool
    *     interaction — fixture-scale, the inferred pool is that tx's root
    *     `to` contract. Searcher positions chain their inferred pools
    *     into the pool set (collect_frontrun_data, mod.rs:758-762), and a
    *     victim's inferred pool victimizes on EITHER side's reach
    *     (mod.rs:678-684 tests front OR back, unlike the both-sides pool
    *     and token arms). */
  private[graft] def bigmacBundlesOf(swTxDf: DataFrame, rootToDf: DataFrame,
      profit: DataFrame, transfersDf: Option[DataFrame] = None): DataFrame = {
    def px(t: Column): Column = tokenPrice(t)

    // tx-grain searcher/victim universe with block-local dense rank.
    // txu / links / pos each feed 4+ downstream joins — localCheckpoint
    // (eager, plan-truncating) computes the window chains ONCE instead of
    // once per consumer (31.6 s → the assembly's real cost at sf0.1).
    val txu = swTxDf
      .groupBy("block_number", "tx_idx", "tx_hash", "eoa")
      .agg(bool_and(
        abs((col("sum_out") / col("sum_in")) /
          (px(col("tok_in")) / px(col("tok_out"))) - 1) <= MaxPriceDiff)
        .as("price_ok"))
      .join(rootToDf, Seq("block_number", "tx_idx"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("block_number").orderBy("tx_idx")))
      .localCheckpoint()
    val txpool = swTxDf.select("block_number", "tx_idx", "pool").distinct()

    // both keyings, stacked
    val ck = txu.withColumn("ktype", lit("eoa")).withColumn("k", col("eoa"))
      .unionByName(txu.withColumn("ktype", lit("contract"))
        .withColumn("k", col("root_to")))
    val wK = Window.partitionBy("block_number", "ktype", "k").orderBy("rnk")
    val links0 = ck
      .withColumn("nxt_rnk", lead(col("rnk"), 1).over(wK))
      .withColumn("nxt_idx", lead(col("tx_idx"), 1).over(wK))
      .withColumn("nxt_hash", lead(col("tx_hash"), 1).over(wK))
      .withColumn("nxt_pok", lead(col("price_ok"), 1).over(wK))
      .withColumn("nxt_eoa", lead(col("eoa"), 1).over(wK))
      .withColumn("nxt_root", lead(col("root_to"), 1).over(wK))
      .filter(col("nxt_rnk").isNotNull)
      .withColumn("n_between", col("nxt_rnk") - col("rnk") - 1)
    // partition_into_gaps: empty links split; running empty count = seg id
    val links = links0
      .withColumn("seg", sum(when(col("n_between") === 0, 1).otherwise(0))
        .over(wK.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("n_between") > 0)
      .withColumn("li", row_number().over(
        Window.partitionBy(segKeys.map(col): _*).orderBy("rnk")))
      .localCheckpoint()
    val seg0 = links.groupBy(segKeys.map(col): _*)
      .agg(max(col("li")).as("m"), sum(col("n_between")).as("tot_v"))

    // searcher positions 1..m+1 (link fronts + the last link's back)
    val pos = links
      .select(segKeys.map(col) ++ Seq(col("li").as("pos"), col("tx_idx"),
        col("rnk"), col("tx_hash"), col("price_ok"), col("eoa"),
        col("root_to")): _*)
      .unionByName(links.join(seg0, segKeys).filter(col("li") === col("m"))
        .select(segKeys.map(col) ++ Seq((col("m") + 1).as("pos"),
          col("nxt_idx").as("tx_idx"), col("nxt_rnk").as("rnk"),
          col("nxt_hash").as("tx_hash"), col("nxt_pok").as("price_ok"),
          col("nxt_eoa").as("eoa"), col("nxt_root").as("root_to")): _*))
      .localCheckpoint()
    val mevc = pos.filter(col("pos") === 2)
      .select(segKeys.map(col) :+
        when(col("ktype") === "contract", col("k"))
          .otherwise(col("root_to")).as("mevc"): _*)
    val eoa1 = pos.filter(col("pos") === 1)
      .select(segKeys.map(col) :+ col("eoa").as("eoa1"): _*)

    // gap victims (all universe txs strictly inside a link's gap)
    val v = txu.select(col("block_number").as("v_block"), col("rnk").as("v_rnk"),
      col("tx_idx").as("vtx"), col("eoa").as("veoa"), col("root_to").as("vroot"))
    val gapv = links.join(v, col("v_block") === col("block_number") &&
        col("v_rnk") > col("rnk") && col("v_rnk") < col("nxt_rnk"))
      .select(segKeys.map(col) ++ Seq(col("li").as("g"), col("vtx"),
        col("veoa"), col("vroot")): _*)

    // transfer-leg gap victims (get_victim_swap_transfer): tx-grain
    // transfer legs strictly inside a link's gap by tx_idx — a tx with no
    // swap still enters the victim-EOA universe through them
    val gapt = transfersDf.map { tf =>
      val t = tf.join(rootToDf, Seq("block_number", "tx_idx"))
        .select(col("block_number").as("t_block"), col("tx_idx").as("t_idx"),
          col("eoa").as("veoa"), col("token").as("vtok"),
          col("root_to").as("vroot"))
      // feeds killed + vt — checkpoint like txu/links/pos so the window
      // chain behind links runs once, not once per consumer
      links.join(t, col("t_block") === col("block_number") &&
          col("t_idx") > col("tx_idx") && col("t_idx") < col("nxt_idx"))
        .select(segKeys.map(col) ++ Seq(col("li").as("g"), col("veoa"),
          col("vtok"), col("vroot")): _*)
        .localCheckpoint()
    }

    // generated pools (generate_possible_pools_from_transfers): a tx with
    // EXACTLY two transfer legs, different tokens, opposite directions is
    // an unclassified-pool interaction whose inferred pool is its root
    // `to`. min/max comparisons stand in for countDistinct (no Expand).
    val inferred = transfersDf.map { tf =>
      tf.groupBy("block_number", "tx_idx")
        .agg(count(lit(1)).as("nlegs"), min(col("eoa")).as("veoa"),
          min(col("token")).as("tmin"), max(col("token")).as("tmax"),
          min(col("direction")).as("dmin"), max(col("direction")).as("dmax"))
        .filter(col("nlegs") === 2 && col("tmin") =!= col("tmax") &&
          col("dmin") =!= col("dmax"))
        .join(rootToDf, Seq("block_number", "tx_idx"))
        .select(col("block_number"), col("tx_idx"), col("veoa"),
          col("root_to").as("gpool"))
        // feeds the searcher pool set (→ fb AND fg) and the victim
        // generated-reach join — checkpoint so the legs agg runs once
        .localCheckpoint()
    }

    // segment caps + mev-contract victim nullification (transfer-only
    // victims nullify too — the reference checks every harvested victim's
    // root, mod.rs:989-1009)
    val killed = gapv.join(mevc, segKeys)
      .filter(col("vroot") === col("mevc")).select(segKeys.map(col): _*)
      .unionByName(gapt.map(_.join(mevc, segKeys)
          .filter(col("vroot") === col("mevc")).select(segKeys.map(col): _*))
        .getOrElse(gapv.limit(0).select(segKeys.map(col): _*)))
      .distinct()
    val segs = seg0.filter(col("m") <= 10 && col("tot_v") <= 30)
      .join(mevc, segKeys).join(killed, segKeys, "left_anti")

    // pool reach: per (seg, gap, victim eoa, pool) the nearest searcher
    // positions on the front (≤ g) and back (≥ g+1) sides. Searcher
    // positions chain their GENERATED pools into the set
    // (collect_frontrun_data, mod.rs:758-762).
    val txpoolAll = inferred match {
      case None => txpool
      case Some(inf) => txpool.unionByName(
        inf.select(col("block_number"), col("tx_idx"),
          col("gpool").as("pool")))
    }
    // Searcher-side key positions and victim-side keys STACK across the
    // three overlap arms (`fam` ∈ pool / tok / gen) so the whole reach
    // surface costs ONE equi-join on (chain, fam, key) + one grain agg —
    // not three of each:
    //   - pool arm (has_pool_overlap): victim SWAP pools vs searcher
    //     pools (incl. the searcher's GENERATED pools,
    //     collect_frontrun_data mod.rs:758-762), front AND back reach;
    //   - token arm (check_for_overlap's matched_tokens): victim
    //     transfer-leg tokens vs searcher swap-leg {tok_in, tok_out},
    //     front AND back;
    //   - generated arm (mod.rs:678-684): the victim's inferred pools vs
    //     the same searcher pool set, EITHER side's reach suffices
    //     (`need_both` = false).
    def onChainFam(s: DataFrame) = s.withColumnsRenamed(Map(
      "block_number" -> "s_block", "ktype" -> "s_ktype",
      "k" -> "s_k", "seg" -> "s_seg", "fam" -> "s_fam", "skey" -> "s_skey"))
    val sPool = pos.join(txpoolAll, Seq("block_number", "tx_idx"))
      .select(segKeys.map(col) ++ Seq(col("pos").as("s_pos"),
        lit("pool").as("fam"), col("pool").as("skey")): _*)
    val vPool = gapv.join(txpool.withColumnRenamed("tx_idx", "vtx"),
        Seq("block_number", "vtx"))
      .select(segKeys.map(col) ++ Seq(col("g"), col("veoa"),
        lit("pool").as("fam"), col("pool").as("vkey"),
        lit(true).as("need_both")): _*)
    val (sAll, vAll) = transfersDf match {
      case None => (sPool, vPool)
      case Some(_) =>
        val txtok = swTxDf
          .select(col("block_number"), col("tx_idx"),
            explode(array(col("tok_in"), col("tok_out"))).as("vtok"))
        val sTok = pos.join(txtok, Seq("block_number", "tx_idx"))
          .select(segKeys.map(col) ++ Seq(col("pos").as("s_pos"),
            lit("tok").as("fam"), col("vtok").cast("string").as("skey")): _*)
        val vTok = gapt.get
          .select(segKeys.map(col) ++ Seq(col("g"), col("veoa"),
            lit("tok").as("fam"), col("vtok").cast("string").as("vkey"),
            lit(true).as("need_both")): _*)
        val inf = inferred.get
        val vGen = links.join(inf.select(col("block_number").as("t_block"),
              col("tx_idx").as("t_idx"), col("veoa"), col("gpool")),
            col("t_block") === col("block_number") &&
              col("t_idx") > col("tx_idx") && col("t_idx") < col("nxt_idx"))
          .select(segKeys.map(col) ++ Seq(col("li").as("g"), col("veoa"),
            lit("pool").as("fam"), col("gpool").as("vkey"),
            lit(false).as("need_both")): _*)
        (sPool.unionByName(sTok),
          vPool.unionByName(vTok).unionByName(vGen))
    }
    val reach = vAll.distinct().join(onChainFam(sAll.distinct()),
        col("s_block") === col("block_number") && col("s_ktype") === col("ktype") &&
          col("s_k") === col("k") && col("s_seg") === col("seg") &&
          col("fam") === col("s_fam") && col("s_skey") === col("vkey"), "left")
      .groupBy((segKeys.map(col) ++ Seq(col("g"), col("veoa"), col("fam"),
        col("vkey"), col("need_both"))): _*)
      .agg(max(when(col("s_pos") <= col("g"), col("s_pos"))).as("fmax"),
        min(when(col("s_pos") >= col("g") + 1, col("s_pos"))).as("bmin"))

    // all ranges within the 6-drop reachability envelope, verified per gap
    val ranges = segs
      .select(segKeys.map(col) ++ Seq(col("m"),
        explode(sequence(lit(1), col("m"))).as("i")): _*)
      .select(segKeys.map(col) ++ Seq(col("m"), col("i"),
        explode(sequence(col("i"), col("m"))).as("j")): _*)
      .filter((col("i") - 1) + (col("m") - col("j")) <= ShrinkRounds)
    val rKeys = segKeys ++ Seq("i", "j")
    val fOk = col("fmax").isNotNull && col("fmax") >= col("i")
    val bOk = col("bmin").isNotNull && col("bmin") <= col("j") + 1
    val gv = ranges.join(reach, segKeys)
      .filter(col("g").between(col("i"), col("j")))
      .groupBy((rKeys.map(col) ++ Seq(col("g"), col("veoa"))): _*)
      .agg(max(when(when(col("need_both"), fOk && bOk).otherwise(fOk || bOk),
        1).otherwise(0)).as("was"))
    val gok = gv.groupBy((rKeys.map(col) :+ col("g")): _*)
      .agg(count(lit(1)).as("n_veoas"), sum(col("was")).as("n_was"))
    val verd = gok.groupBy(rKeys.map(col): _*)
      .agg(bool_and(col("n_was") >= 1 &&
        col("n_was") * MinVictimRatioDen >= col("n_veoas")).as("ok"))
      .join(ranges, rKeys)

    // 6-level shrink reachability: failing ranges of ≥2 links spawn their
    // front-drop and back-drop children; emit every verified reached range.
    // A segment holds ≤ ~28 candidate ranges, so the recursion runs INSIDE
    // one array expression per segment (roll ranges up with collect_list,
    // step the levels with aggregate() so each level is MATERIALIZED in the
    // accumulator — naively nesting the levels as filter/exists lambdas
    // re-evaluates every inner level per outer element, O(n^drops)/segment,
    // and cost 30+ s at sf0.1 — then explode the emitted set): one shuffle,
    // versus the 14 a per-level join/distinct loop costs. A range at drops
    // d is reachable only at level d, so the emit concat cannot duplicate.
    val emitExpr = shrinkEmitExpr(ShrinkRounds)
    // emit is ~hundreds of rows but feeds BOTH detail rollups (pagg, vagg);
    // the checkpoint runs the whole verification chain once, not twice.
    val emit = verd
      .groupBy(segKeys.map(col): _*)
      .agg(collect_list(struct(col("i"), col("j"), col("m"), col("ok")))
        .as("rs"))
      .select(segKeys.map(col) :+ explode(expr(emitExpr)).as("r"): _*)
      .select(segKeys.map(col) ++
        Seq(col("r.i").as("i"), col("r.j").as("j"), col("r.m").as("m")): _*)
      .localCheckpoint()

    // details: position rollup, gap victim totals, profit, dedup signature
    val pr = pos.join(profit.select(col("tx_hash").as("p_hash"),
      col("profit_usd")), col("tx_hash") === col("p_hash"), "left")
    val pagg = emit.join(pr, segKeys)
      .filter(col("pos").between(col("i"), col("j") + 1))
      .groupBy((rKeys :+ "m").map(col): _*)
      .agg(min_by(col("tx_idx"), col("pos")).as("front_idx"),
        max_by(col("tx_idx"), col("pos")).as("back_idx"),
        bool_and(col("price_ok")).as("has_dex_price"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("pos"), col("tx_idx")))),
          x => x.getField("tx_idx").cast("string"))).as("chain_sig"),
        dsumR(col("profit_usd")).as("profit_raw"))
    val vagg = emit.join(links.select(segKeys.map(col) ++
        Seq(col("li"), col("n_between")): _*), segKeys)
      .filter(col("li").between(col("i"), col("j")))
      .groupBy(rKeys.map(col): _*)
      .agg(sum(col("n_between")).as("n_victim_txs"))
    val all = pagg.join(vagg, rKeys)
      .join(segs.select(segKeys.map(col) :+ col("mevc"): _*), segKeys)
      .join(eoa1, segKeys)
      .select(col("block_number"), col("ktype").as("key_type"),
        when(col("ktype") === "eoa", col("k")).otherwise(col("eoa1")).as("eoa"),
        col("mevc").as("contract"), col("front_idx"), col("back_idx"),
        (col("j") - col("i") + 1).cast("long").as("n_frontruns"),
        col("n_victim_txs"),
        (col("i") - 1).cast("long").as("drops_front"),
        (col("m") - col("j")).cast("long").as("drops_back"),
        col("has_dex_price"),
        when(col("has_dex_price"), col("profit_raw")).otherwise(lit(0.0e0))
          .as("profit_usd"),
        col("chain_sig"))
    // senders/contracts dedup: identical emitted chains keep the senders row
    all.withColumn("rn", row_number().over(
        Window.partitionBy("block_number", "chain_sig")
          .orderBy(col("key_type").desc)))
      .filter(col("rn") === 1).drop("rn")
  }

  // ── DuckDB oracle: the same computation as generated CTEs ────────────────

  private val segK = "block_number, ktype, k, seg"
  private def onSeg(a: String, b: String) =
    s"$a.block_number = $b.block_number AND $a.ktype = $b.ktype AND $a.k = $b.k AND $a.seg = $b.seg"

  private val bigmacCtes: String = {
    val exRounds = (0 until ShrinkRounds).map { d =>
      s"""bm_ex${d + 1} AS (
        SELECT DISTINCT v.* FROM bm_ex$d e JOIN bm_verd v
          ON ${onSeg("v", "e")}
         AND ((v.i = e.i + 1 AND v.j = e.j) OR (v.i = e.i AND v.j = e.j - 1))
        WHERE NOT e.ok AND e.j - e.i + 1 >= 2)"""
    }.mkString(",\n      ")
    val emitUnion = (0 to ShrinkRounds)
      .map(d => s"SELECT * FROM bm_ex$d WHERE ok").mkString(" UNION ALL ")
    s"""bm_rt AS (
      SELECT block_number, tx_idx, ARG_MIN(to_address, trace_idx) AS root_to
      FROM actions GROUP BY 1, 2),
    bm_txu0 AS (
      SELECT t.block_number, t.tx_idx, t.tx_hash, t.eoa, r.root_to,
        BOOL_AND(ABS((t.sum_out / t.sum_in) /
          (${tokenPriceSql("t.tok_in")} / ${tokenPriceSql("t.tok_out")}) - 1)
          <= $MaxPriceDiff) AS price_ok
      FROM sw_tx t JOIN bm_rt r
        ON r.block_number = t.block_number AND r.tx_idx = t.tx_idx
      GROUP BY 1, 2, 3, 4, 5),
    bm_txu AS MATERIALIZED (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY block_number ORDER BY tx_idx)
        AS rnk
      FROM bm_txu0),
    bm_txpool AS MATERIALIZED (SELECT DISTINCT block_number, tx_idx, pool FROM sw_tx),
    bm_ck AS (
      SELECT *, 'eoa' AS ktype, eoa AS k FROM bm_txu
      UNION ALL SELECT *, 'contract', root_to FROM bm_txu),
    bm_lk0 AS (
      SELECT *, LEAD(rnk) OVER w AS nxt_rnk, LEAD(tx_idx) OVER w AS nxt_idx,
        LEAD(tx_hash) OVER w AS nxt_hash, LEAD(price_ok) OVER w AS nxt_pok,
        LEAD(eoa) OVER w AS nxt_eoa, LEAD(root_to) OVER w AS nxt_root
      FROM bm_ck
      WINDOW w AS (PARTITION BY block_number, ktype, k ORDER BY rnk)),
    bm_lk1 AS (
      SELECT *, nxt_rnk - rnk - 1 AS n_between,
        SUM(CASE WHEN nxt_rnk - rnk - 1 = 0 THEN 1 ELSE 0 END)
          OVER (PARTITION BY block_number, ktype, k ORDER BY rnk
                ROWS UNBOUNDED PRECEDING) AS seg
      FROM bm_lk0 WHERE nxt_rnk IS NOT NULL),
    bm_lnk AS MATERIALIZED (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY $segK ORDER BY rnk) AS li
      FROM bm_lk1 WHERE n_between > 0),
    bm_seg0 AS MATERIALIZED (
      SELECT $segK, MAX(li) AS m, SUM(n_between) AS tot_v
      FROM bm_lnk GROUP BY 1, 2, 3, 4),
    bm_pos AS MATERIALIZED (
      SELECT $segK, li AS pos, tx_idx, rnk, tx_hash, price_ok, eoa, root_to
      FROM bm_lnk
      UNION ALL
      SELECT l.block_number, l.ktype, l.k, l.seg, s.m + 1, l.nxt_idx,
        l.nxt_rnk, l.nxt_hash, l.nxt_pok, l.nxt_eoa, l.nxt_root
      FROM bm_lnk l JOIN bm_seg0 s ON ${onSeg("l", "s")}
      WHERE l.li = s.m),
    bm_mevc AS (
      SELECT $segK,
        CASE WHEN ktype = 'contract' THEN k ELSE root_to END AS mevc
      FROM bm_pos WHERE pos = 2),
    bm_eoa1 AS (SELECT $segK, eoa AS eoa1 FROM bm_pos WHERE pos = 1),
    bm_gapv AS MATERIALIZED (
      SELECT l.block_number, l.ktype, l.k, l.seg, l.li AS g,
        v.tx_idx AS vtx, v.eoa AS veoa, v.root_to AS vroot
      FROM bm_lnk l JOIN bm_txu v
        ON v.block_number = l.block_number
       AND v.rnk > l.rnk AND v.rnk < l.nxt_rnk),
    bm_tf AS MATERIALIZED (
      SELECT a.block_number, a.tx_idx, a.from_address AS eoa,
        a.token_in_id AS vtok, a.direction, r.root_to
      FROM actions a JOIN bm_rt r
        ON r.block_number = a.block_number AND r.tx_idx = a.tx_idx
      WHERE a.action_type = 'transfer' AND a.amount_in IS NOT NULL),
    bm_inf AS MATERIALIZED (
      SELECT block_number, tx_idx, MIN(eoa) AS veoa, MIN(root_to) AS gpool
      FROM bm_tf
      GROUP BY 1, 2
      HAVING COUNT(*) = 2 AND MIN(vtok) <> MAX(vtok)
         AND MIN(direction) <> MAX(direction)),
    bm_gapt AS MATERIALIZED (
      SELECT l.block_number, l.ktype, l.k, l.seg, l.li AS g,
        t.eoa AS veoa, t.vtok, t.root_to AS vroot
      FROM bm_lnk l JOIN bm_tf t
        ON t.block_number = l.block_number
       AND t.tx_idx > l.tx_idx AND t.tx_idx < l.nxt_idx),
    bm_segs AS MATERIALIZED (
      SELECT s.*, c.mevc FROM bm_seg0 s JOIN bm_mevc c ON ${onSeg("s", "c")}
      WHERE s.m <= 10 AND s.tot_v <= 30
        AND NOT EXISTS (SELECT 1 FROM bm_gapv gv
          WHERE ${onSeg("gv", "s")} AND gv.vroot = c.mevc)
        AND NOT EXISTS (SELECT 1 FROM bm_gapt gt
          WHERE ${onSeg("gt", "s")} AND gt.vroot = c.mevc)),
    bm_txpool_all AS (
      SELECT block_number, tx_idx, pool FROM bm_txpool
      UNION ALL SELECT block_number, tx_idx, gpool FROM bm_inf),
    bm_sp AS MATERIALIZED (
      SELECT DISTINCT p.block_number, p.ktype, p.k, p.seg, p.pos, tp.pool
      FROM bm_pos p JOIN bm_txpool_all tp
        ON tp.block_number = p.block_number AND tp.tx_idx = p.tx_idx),
    bm_vp AS (
      SELECT DISTINCT g.block_number, g.ktype, g.k, g.seg, g.g, g.veoa, tp.pool
      FROM bm_gapv g JOIN bm_txpool tp
        ON tp.block_number = g.block_number AND tp.tx_idx = g.vtx),
    bm_fb AS (
      SELECT v.block_number, v.ktype, v.k, v.seg, v.g, v.veoa, v.pool,
        MAX(CASE WHEN s.pos <= v.g THEN s.pos END) AS fmax,
        MIN(CASE WHEN s.pos >= v.g + 1 THEN s.pos END) AS bmin
      FROM bm_vp v LEFT JOIN bm_sp s
        ON ${onSeg("s", "v")} AND s.pool = v.pool
      GROUP BY 1, 2, 3, 4, 5, 6, 7),
    bm_txtok AS (
      SELECT DISTINCT block_number, tx_idx, tok FROM (
        SELECT block_number, tx_idx, tok_in AS tok FROM sw_tx
        UNION ALL SELECT block_number, tx_idx, tok_out FROM sw_tx)),
    bm_st AS (
      SELECT DISTINCT p.block_number, p.ktype, p.k, p.seg, p.pos, tt.tok
      FROM bm_pos p JOIN bm_txtok tt
        ON tt.block_number = p.block_number AND tt.tx_idx = p.tx_idx),
    bm_vt AS (
      SELECT DISTINCT block_number, ktype, k, seg, g, veoa, vtok
      FROM bm_gapt),
    bm_ft AS (
      SELECT v.block_number, v.ktype, v.k, v.seg, v.g, v.veoa, v.vtok,
        MAX(CASE WHEN s.pos <= v.g THEN s.pos END) AS fmax,
        MIN(CASE WHEN s.pos >= v.g + 1 THEN s.pos END) AS bmin
      FROM bm_vt v LEFT JOIN bm_st s
        ON ${onSeg("s", "v")} AND s.tok = v.vtok
      GROUP BY 1, 2, 3, 4, 5, 6, 7),
    bm_vg AS (
      SELECT DISTINCT l.block_number, l.ktype, l.k, l.seg, l.li AS g,
        t.veoa, t.gpool
      FROM bm_lnk l JOIN bm_inf t
        ON t.block_number = l.block_number
       AND t.tx_idx > l.tx_idx AND t.tx_idx < l.nxt_idx),
    bm_fg AS (
      SELECT v.block_number, v.ktype, v.k, v.seg, v.g, v.veoa, v.gpool,
        MAX(CASE WHEN s.pos <= v.g THEN s.pos END) AS fmax,
        MIN(CASE WHEN s.pos >= v.g + 1 THEN s.pos END) AS bmin
      FROM bm_vg v LEFT JOIN bm_sp s
        ON ${onSeg("s", "v")} AND s.pool = v.gpool
      GROUP BY 1, 2, 3, 4, 5, 6, 7),
    bm_reach AS MATERIALIZED (
      SELECT block_number, ktype, k, seg, g, veoa, fmax, bmin,
        true AS need_both FROM bm_fb
      UNION ALL
      SELECT block_number, ktype, k, seg, g, veoa, fmax, bmin,
        true AS need_both FROM bm_ft
      UNION ALL
      SELECT block_number, ktype, k, seg, g, veoa, fmax, bmin,
        false AS need_both FROM bm_fg),
    bm_rng AS MATERIALIZED (
      SELECT s.*, i.i, j.j FROM bm_segs s,
        LATERAL unnest(generate_series(1, s.m)) i(i),
        LATERAL unnest(generate_series(i.i, s.m)) j(j)
      WHERE (i.i - 1) + (s.m - j.j) <= $ShrinkRounds),
    bm_gv AS (
      SELECT r.block_number, r.ktype, r.k, r.seg, r.i, r.j, f.g, f.veoa,
        MAX(CASE WHEN CASE WHEN f.need_both
                 THEN (f.fmax IS NOT NULL AND f.fmax >= r.i)
                  AND (f.bmin IS NOT NULL AND f.bmin <= r.j + 1)
                 ELSE (f.fmax IS NOT NULL AND f.fmax >= r.i)
                   OR (f.bmin IS NOT NULL AND f.bmin <= r.j + 1) END
                 THEN 1 ELSE 0 END) AS was
      FROM bm_rng r JOIN bm_reach f
        ON ${onSeg("f", "r")} AND f.g BETWEEN r.i AND r.j
      GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
    bm_gok AS (
      SELECT $segK, i, j, g, COUNT(*) AS n_veoas, SUM(was) AS n_was
      FROM bm_gv GROUP BY 1, 2, 3, 4, 5, 6, 7),
    bm_verd AS MATERIALIZED (
      SELECT r.block_number, r.ktype, r.k, r.seg, r.m, r.i, r.j,
        BOOL_AND(g.n_was >= 1 AND g.n_was * $MinVictimRatioDen >= g.n_veoas)
          AS ok
      FROM bm_rng r JOIN bm_gok g
        ON ${onSeg("g", "r")} AND g.i = r.i AND g.j = r.j
      GROUP BY 1, 2, 3, 4, 5, 6, 7),
    bm_ex0 AS (SELECT * FROM bm_verd WHERE i = 1 AND j = m),
    $exRounds,
    bm_emit AS MATERIALIZED ($emitUnion),
    bm_pagg AS (
      SELECT e.block_number, e.ktype, e.k, e.seg, e.i, e.j, e.m,
        ARG_MIN(p.tx_idx, p.pos) AS front_idx,
        ARG_MAX(p.tx_idx, p.pos) AS back_idx,
        BOOL_AND(p.price_ok) AS has_dex_price,
        STRING_AGG(CAST(p.tx_idx AS VARCHAR), ',' ORDER BY p.pos) AS chain_sig,
        ${sqlSumR("h.profit_usd")} AS profit_raw
      FROM bm_emit e JOIN bm_pos p
        ON ${onSeg("p", "e")} AND p.pos BETWEEN e.i AND e.j + 1
      LEFT JOIN header h ON h.tx_hash = p.tx_hash
      GROUP BY 1, 2, 3, 4, 5, 6, 7),
    bm_vagg AS (
      SELECT e.block_number, e.ktype, e.k, e.seg, e.i, e.j,
        SUM(l.n_between) AS n_victim_txs
      FROM bm_emit e JOIN bm_lnk l
        ON ${onSeg("l", "e")} AND l.li BETWEEN e.i AND e.j
      GROUP BY 1, 2, 3, 4, 5, 6),
    bm_all AS (
      SELECT p.block_number, p.ktype AS key_type,
        CASE WHEN p.ktype = 'eoa' THEN p.k ELSE e1.eoa1 END AS eoa,
        s.mevc AS contract, p.front_idx, p.back_idx,
        p.j - p.i + 1 AS n_frontruns, v.n_victim_txs,
        p.i - 1 AS drops_front, p.m - p.j AS drops_back, p.has_dex_price,
        CASE WHEN p.has_dex_price THEN p.profit_raw ELSE 0.0e0 END
          AS profit_usd,
        p.chain_sig
      FROM bm_pagg p
      JOIN bm_vagg v ON ${onSeg("v", "p")} AND v.i = p.i AND v.j = p.j
      JOIN bm_segs s ON ${onSeg("s", "p")}
      JOIN bm_eoa1 e1 ON ${onSeg("e1", "p")})"""
  }

  private val q1Bigmac = QueryDef(
    "q1_bigmac",
    (s, dir) => {
      val hdr = Accounting.bundleHeaders(s, dir).select("tx_hash", "profit_usd")
      val tf = actionsTable(s, dir)
        .filter(col("action_type") === "transfer" && col("amount_in").isNotNull)
        .select(col("block_number"), col("tx_idx"),
          col("from_address").as("eoa"), col("token_in_id").as("token"),
          col("direction"))
      bigmacBundlesOf(InspectorOps.swTxOf(s, dir), rootTo(s, dir), hdr,
          Some(tf))
        .orderBy("block_number", "front_idx", "back_idx", "n_frontruns",
          "chain_sig")
    },
    withCtes(s"""${InspectorOps.swTxCteShared}, $bigmacCtes
      SELECT block_number, key_type, eoa, contract, front_idx, back_idx,
        CAST(n_frontruns AS BIGINT) AS n_frontruns,
        CAST(n_victim_txs AS BIGINT) AS n_victim_txs,
        CAST(drops_front AS BIGINT) AS drops_front,
        CAST(drops_back AS BIGINT) AS drops_back,
        has_dex_price, profit_usd, chain_sig
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY block_number, chain_sig ORDER BY key_type DESC) AS rn
        FROM bm_all)
      WHERE rn = 1
      ORDER BY block_number, front_idx, back_idx, n_frontruns, chain_sig"""))
}
