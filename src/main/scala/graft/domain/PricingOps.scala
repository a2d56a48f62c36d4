package graft.domain

import graft.{QueryDef, QueryModule}
import graft.ops.ExactAgg._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DEX pricing-graph subsystem (SURVEY §2.10 G1–G6) — the reference's
  * `brontes-pricing` crate re-expressed as an edge table + windows, with
  * the one genuinely iterative piece (Yen's k-shortest paths) as a bounded
  * driver-side search over the COLLECTED edge list, exactly as SURVEY §4.3
  * prescribes (the token graph is a dimension, not a fact: ~10^6 edges in
  * production, trivially driver-sized).
  *
  * Reference: AllPairGraph (graphs/all_pair_graph.rs:23-318), Yen/Dijkstra
  * (graphs/yens.rs:109, dijkstras.rs), PairSubGraph price fetch
  * (graphs/subgraph.rs:316,908), verification (subgraph_verifier.rs:1-489),
  * registry (graphs/registry.rs:1-368), per-tx-index emission
  * (brontes-pricing/src/lib.rs poll loop → DexQuotes).
  */
object PricingOps extends QueryModule {

  import Accounting._

  def defs: Seq[QueryDef] = Seq(g1EdgeTable, g2KPaths, g2PathsEnum,
    g3SubgraphPrice, g4SubgraphVerify, g4VerifiedRoutes, g5RegistryCache,
    g5CrossRunCache, g6PriceEmission)

  /** Simple-path search bound (hops) and endpoints for the DISTRIBUTED
    * enumeration: token 8 sits 3-4 near-ring steps from 0, so the bounded
    * search has real multiplicity without enumerating the whole graph. */
  val PathHops = 4
  val PathSrc = 0L
  val PathDst = 8L

  /** G2 (distributed, oracle-checked form): bounded simple-path enumeration
    * [[PathSrc]] → [[PathDst]] — the all_pair_graph path search expressed as L
    * UNROLLED frontier⨝edges joins (no driver loop, no collected graph;
    * the complement of g2_kpaths' SURVEY-sanctioned driver-side Yen).
    * Cycle check = array_contains on the carried path; every join is
    * equi-keyed on the frontier head. Fully hash-checked: the oracle is a
    * DuckDB recursive CTE with the identical bound and cycle rule. */
  // lazy: references edgesCte, which initializes later in this object
  private lazy val g2PathsEnum = QueryDef(
    "g2_paths_enum",
    (s, dir) => {
      val (srcTok, dstTok) = (PathSrc, PathDst)
      val e = edges(s, dir).select("src", "dst").distinct().persist()
      var frontier = e.filter(col("src") === srcTok)
        .select(array(col("src"), col("dst")).as("path"), col("dst").as("head"))
      var done = frontier.filter(col("head") === dstTok).select("path")
      for (_ <- 2 to PathHops) {
        frontier = frontier.filter(col("head") =!= dstTok)
          .join(e, col("head") === col("src"))
          .filter(!array_contains(col("path"), col("dst")))
          .select(concat(col("path"), array(col("dst"))).as("path"),
            col("dst").as("head"))
        done = done.unionByName(frontier.filter(col("head") === dstTok)
          .select("path"))
      }
      done
        .withColumn("hops", (size(col("path")) - 1).cast("long"))
        .withColumn("path_str", concat_ws("->", col("path")))
        .groupBy("hops")
        .agg(count(lit(1)).as("n_paths"), min(col("path_str")).as("first_path"))
        .orderBy("hops")
    },
    withCtes(s"""$edgesCte,
      e2 AS (SELECT DISTINCT src, dst FROM edges),
      paths AS (
        SELECT * FROM (
          WITH RECURSIVE walk(path, head) AS (
            SELECT [src, dst] AS path, dst AS head FROM e2 WHERE src = $PathSrc
            UNION ALL
            SELECT list_append(w.path, e.dst), e.dst
            FROM walk w JOIN e2 e ON w.head = e.src
            WHERE w.head <> $PathDst AND NOT list_contains(w.path, e.dst)
              AND len(w.path) <= $PathHops)
          SELECT path FROM walk WHERE head = $PathDst))
      SELECT CAST(len(path) - 1 AS BIGINT) AS hops, COUNT(*) AS n_paths,
        MIN(list_aggregate(list_transform(path, x -> CAST(x AS VARCHAR)),
          'string_agg', '->')) AS first_path
      FROM paths GROUP BY 1 ORDER BY 1"""))

  private def withCtes(sql: String) = Some(s"WITH $sqlDomainCtes, $sql")

  /** Directed swap-rate edges observed in the data: src/dst token, pooled
    * volume and rate. The liquidity-weighted rate Σout/Σin is what
    * PairSubGraph's fetch_price weights by. */
  private def edges(s: SparkSession, dir: String): DataFrame =
    ChainFixture.actionsTable(s, dir)
      .filter(col("action_type") === "swap" &&
        col("amount_in").isNotNull && col("amount_out").isNotNull)
      .groupBy(col("token_in_id").as("src"), col("token_out_id").as("dst"))
      .agg(count(lit(1)).as("n_swaps"),
        countDistinct(col("pool")).as("n_pools"),
        dsum(col("amount_in")).as("vol_in"),
        dsum(col("amount_out")).as("vol_out"))
      .withColumn("px", col("vol_out") / col("vol_in"))

  private val edgesCte =
    s"""edges AS (
      SELECT token_in_id AS src, token_out_id AS dst, COUNT(*) AS n_swaps,
        CAST(COUNT(DISTINCT pool) AS BIGINT) AS n_pools,
        ${sqlSum("amount_in")} AS vol_in, ${sqlSum("amount_out")} AS vol_out,
        ${sqlSum("amount_out")} / ${sqlSum("amount_in")} AS px
      FROM actions
      WHERE action_type = 'swap' AND amount_in IS NOT NULL AND amount_out IS NOT NULL
      GROUP BY 1, 2)"""

  /** G1: AllPairGraph edge maintenance — the materialized edge table. */
  private val g1EdgeTable = QueryDef(
    "g1_edge_table",
    (s, dir) => edges(s, dir)
      .select("src", "dst", "n_swaps", "n_pools", "vol_in", "px")
      .orderBy("src", "dst"),
    withCtes(s"""$edgesCte
      SELECT src, dst, n_swaps, n_pools, vol_in, px
      FROM edges ORDER BY 1, 2"""))

  /** G2: Yen's k-shortest paths on the collected edge list — bounded
    * driver-side loop (iterative, SURVEY §4.3 sanctioned: the edge list is
    * dimension-sized). Edge cost is hop count first, then the lexicographic
    * path string as the deterministic tiebreak; with an exact shortest-path
    * subroutine under that order, Yen's k results ARE the global top-k
    * loopless paths — so the query is fully oracle-checkable against a
    * bounded recursive-CTE enumeration (no longer rows-only).
    * Searches token 0 → token 20, k = 3. */
  private val g2KPaths = QueryDef(
    "g2_kpaths",
    (s, dir) => {
      import s.implicits._
      val es = edges(s, dir).select("src", "dst").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted.toList }
      def shortest(from: Long, to: Long,
          banned: Set[(Long, Long)], bannedNodes: Set[Long]): Option[List[Long]] = {
        // BFS by hop count with lexicographic-min tiebreak (deterministic)
        var frontier = List(List(from))
        var visited = Set(from)
        var found: Option[List[Long]] = None
        while (found.isEmpty && frontier.nonEmpty) {
          val next = for {
            p <- frontier
            n <- adj.getOrElse(p.head, Nil)
            if !visited.contains(n) && !banned.contains((p.head, n)) &&
              !bannedNodes.contains(n)
          } yield n :: p
          // exact (hops, lex) minimum: among same-level hits take the
          // lexicographic-min path, not the first in iteration order —
          // this is what makes Yen's output equal the global top-k of the
          // recursive-CTE enumeration the oracle runs
          val hits = next.filter(_.head == to)
          found =
            if (hits.isEmpty) None
            else Some(hits.minBy(_.reverse.mkString(",")).reverse)
          visited = visited ++ next.map(_.head)
          frontier = next.groupBy(_.head).values.map(_.minBy(_.reverse.mkString(","))).toList
        }
        found
      }
      val k = 3
      val (srcTok, dstTok) = (0L, 20L)
      var paths = shortest(srcTok, dstTok, Set.empty, Set.empty).toList
      var candidates = List.empty[List[Long]]
      // Yen's: branch at each spur node of the last accepted path
      for (_ <- 1 until k) {
        paths.lastOption.foreach { prev =>
          for (i <- prev.indices.dropRight(1)) {
            val spur = prev(i)
            val rootPath = prev.take(i + 1)
            val banned = paths.filter(_.take(i + 1) == rootPath)
              .flatMap(p => if (p.length > i + 1) Some((p(i), p(i + 1))) else None).toSet
            shortest(spur, dstTok, banned, rootPath.dropRight(1).toSet)
              .map(rootPath.dropRight(1) ++ _)
              .filterNot(paths.contains).filterNot(candidates.contains)
              .foreach(p => candidates = candidates :+ p)
          }
          if (candidates.nonEmpty) {
            val best = candidates.minBy(p => (p.length, p.mkString(",")))
            paths = paths :+ best
            candidates = candidates.filterNot(_ == best)
          }
        }
      }
      paths.zipWithIndex
        .map { case (p, i) => (i + 1, p.length - 1, p.mkString("->")) }
        .toDF("rank", "n_hops", "path")
    },
    // Yen's with cost (hops, lex path-string) and an EXACT shortest-path
    // subroutine returns precisely the global k smallest loopless paths
    // under that order — which a bounded recursive-CTE enumeration can
    // rank directly. Fixture 0→20 tops out at 11 hops (1×10-hop path,
    // then 55×11-hop); the 12-hop bound leaves headroom and stays ~40k
    // walk states.
    withCtes(s"""$edgesCte,
      e2 AS (SELECT DISTINCT src, dst FROM edges),
      kp AS (
        SELECT * FROM (
          WITH RECURSIVE walk(path, head) AS (
            SELECT [src, dst] AS path, dst AS head FROM e2 WHERE src = 0
            UNION ALL
            SELECT list_append(w.path, e.dst), e.dst
            FROM walk w JOIN e2 e ON w.head = e.src
            WHERE w.head <> 20 AND NOT list_contains(w.path, e.dst)
              AND len(w.path) <= 12)
          SELECT path FROM walk WHERE head = 20))
      SELECT CAST(rank AS INT) AS rank, CAST(len(path) - 1 AS INT) AS n_hops,
        list_aggregate(list_transform(path, x -> CAST(x AS VARCHAR)),
          'string_agg', '->') AS path
      FROM (
        SELECT path, ROW_NUMBER() OVER (ORDER BY len(path),
          list_aggregate(list_transform(path, x -> CAST(x AS VARCHAR)),
            'string_agg', ',')) AS rank
        FROM kp) WHERE rank <= 3 ORDER BY rank"""))

  /** G3: subgraph price fetch — 2-hop quotes through an intermediary,
    * best-product route per (src, dst) pair (the multiply-along-path +
    * pick-best of PairSubGraph::fetch_price). */
  private val g3SubgraphPrice = QueryDef(
    "g3_subgraph_price",
    (s, dir) => {
      val e = edges(s, dir).persist()
      val e1 = e.select(col("src"), col("dst").as("mid"), col("px").as("px1"))
      val two = e1.join(e.select(col("src").as("m2"), col("dst"), col("px").as("px2")),
          col("mid") === col("m2"))
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst")
        .agg(max(col("px1") * col("px2")).as("best_px"),
          count(lit(1)).as("n_routes"))
      two.filter(col("src") < 5)
        .orderBy("src", "dst")
    },
    withCtes(s"""$edgesCte,
      two AS (
        SELECT a.src, b.dst, MAX(a.px * b.px) AS best_px, COUNT(*) AS n_routes
        FROM edges a JOIN edges b ON a.dst = b.src
        WHERE a.src <> b.dst
        GROUP BY 1, 2)
      SELECT src, dst, best_px, n_routes FROM two
      WHERE src < 5 ORDER BY 1, 2"""))

  /** Rundown rounds bound (the reference re-verifies until the edge set
    * is liquidity-stable; subgraph_verifier.rs re-queues, subgraph.rs:
    * 409-443 prunes per pass — 6 rounds covers the fixture's cascade with
    * headroom, mirroring W3's bounded-shrink shape). */
  val RundownRounds = 6

  /** Support coupling + threshold scale for the rundown prune rule. */
  val RundownCoupling = 0.2
  val RundownAlpha = 1.6

  private def exactSum(xs: Iterable[Double]): Double =
    graft.ops.ExactAgg.dsumDriver(xs)

  /** G4's rundown cascade (subgraph.rs:409-443, subgraph_verifier.rs) on
    * the collected edge list — an edge's verified liquidity is its own
    * volume PLUS coupled support from the kept edges feeding its source
    * (the BFS liquidity of the reference); pruning an edge lowers its
    * neighbors' support, so the prune CASCADES and must re-verify until
    * stable.
    *
    * The edge table is a DIMENSION (SURVEY §4.3: ~10^6 edges in
    * production), so — exactly like g2_kpaths' Yen — the cascade runs on
    * the COLLECTED edge list: one distributed job builds the edges, then
    * six driver-local rounds replace what was previously 8 sequential
    * dimension-sized Spark jobs whose fixed launch overhead dominated
    * (7.2 s → sub-second; VERDICT r6 Wrong #3). Driver sums go through
    * [[graft.ops.ExactAgg.dsumDriver]] so the hash still matches the
    * DuckDB oracle's sqlSum.
    *
    * Returns the per-round (round, n_kept, vol_kept) stats and the FINAL
    * surviving edge set (src, dst, n_swaps, vol_in, px) — the verified
    * subgraph the route enumeration ([[g4VerifiedRoutes]]) prices over. */
  private def rundownKept(s: SparkSession, dir: String)
      : (Seq[(Long, Long, Double)], Seq[(Long, Long, Long, Double, Double)]) = {
    val es = edges(s, dir).select("src", "dst", "n_swaps", "vol_in", "px")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    // threshold is FIXED from the round-0 edge set (mean volume × α):
    // re-deriving it per round would chase the prune instead of verifying
    // against the original liquidity bar; 0 edges → nothing survives
    val thr =
      if (es.isEmpty) 0.0
      else exactSum(es.map(_._4)) / es.length * RundownAlpha
    var kept = es.toSeq
    val perRound = (1 to RundownRounds).map { r =>
      val inflow = kept.groupBy(_._2)
        .map { case (d, g) => d -> exactSum(g.map(_._4)) }
      kept = kept.filter(e =>
        e._3 >= 5 && e._4 + inflow.getOrElse(e._1, 0.0) * RundownCoupling > thr)
      (r.toLong, kept.size.toLong, exactSum(kept.map(_._4)))
    }
    (perRound, kept)
  }

  private val g4SubgraphVerify = QueryDef(
    "g4_subgraph_verify",
    (s, dir) => {
      import s.implicits._
      val (perRound, _) = rundownKept(s, dir)
      val w = Window.orderBy("round")
      perRound.toDF("round", "n_kept", "vol_kept")
        .withColumn("stable",
          (col("n_kept") === lag(col("n_kept"), 1).over(w)).cast("int"))
        .select("round", "n_kept", "vol_kept", "stable")
        .orderBy("round")
    },
    withCtes {
      val roundRows = (1 to RundownRounds).map { r =>
        s"SELECT CAST($r AS BIGINT) AS round, COUNT(*) AS n_kept, " +
          s"${sqlSum("vol_in")} AS vol_kept FROM k$r"
      }.mkString("\n        UNION ALL ")
      s"""$edgesCte,
      $rundownChainSql,
      g4s AS (
        $roundRows)
      SELECT round, n_kept, vol_kept,
        CAST(n_kept = LAG(n_kept) OVER (ORDER BY round) AS INT) AS stable
      FROM g4s ORDER BY round"""
    })

  /** Oracle form of the rundown chain: fixed threshold + k1..kN prune
    * rounds over `edges` (shared by g4_subgraph_verify and
    * g4_verified_routes; k[[RundownRounds]] is the verified edge set). */
  private lazy val rundownChainSql: String = {
    val roundCtes = (1 to RundownRounds).map { r =>
      val prev = if (r == 1) "edges" else s"k${r - 1}"
      s"""k$r AS (
        SELECT e.src, e.dst, e.n_swaps, e.vol_in, e.px
        FROM $prev e LEFT JOIN (
          SELECT dst, ${sqlSum("vol_in")} AS inflow FROM $prev GROUP BY 1) i
          ON e.src = i.dst
        WHERE e.n_swaps >= 5
          AND e.vol_in + COALESCE(i.inflow, 0.0e0) * ${RundownCoupling}e0
              > (SELECT t FROM g4thr))"""
    }.mkString(",\n      ")
    s"""g4thr AS (SELECT ${sqlSum("vol_in")} / COUNT(*) * ${RundownAlpha}e0 AS t
                FROM edges),
      $roundCtes"""
  }

  /** Route-search bound for the verified-subgraph enumeration: 4 hops = 3
    * intermediaries, one past j4_multihop's fixed two — the "arbitrary
    * depth" regime of the reference's subgraph routing. */
  val RouteHops = 4

  /** G4 (routing arm): depth-k route pricing over the VERIFIED subgraph —
    * the reference prices long-tail pairs through verified subgraphs of
    * arbitrary depth (graphs/subgraph.rs:316 fetch_price walks the stored
    * path set; time_window_vwam.rs:484 routes through them), where
    * verification is the g4 rundown. Simple paths up to [[RouteHops]] hops
    * are enumerated by UNROLLED frontier⨝edges equi-joins over the
    * surviving edge set (dimension-sized by SURVEY §4.3 — the fact volume
    * never enters the search); the winning route per (src, dst) maximizes
    * BOTTLENECK liquidity (min leg volume — the subgraph verifier's bar),
    * then price, then lexicographic path. Route price is the leg-ordered
    * product of liquidity-weighted rates, so both engines fold the same
    * IEEE multiply chain and the hash is exact. */
  private val g4VerifiedRoutes = QueryDef(
    "g4_verified_routes",
    (s, dir) => {
      import s.implicits._
      val ve = rundownKept(s, dir)._2
        .map(e => (e._1, e._2, e._4, e._5)).toDF("src", "dst", "vol_in", "px")
      val er = ve.select(col("src").as("e_src"), col("dst").as("e_dst"),
        col("px").as("e_px"), col("vol_in").as("e_vol"))
      var frontier = ve.select(col("src").as("origin"), col("dst").as("head"),
        array(col("src"), col("dst")).as("path"),
        col("px").as("px_prod"), col("vol_in").as("bneck"))
      var all = frontier
      for (_ <- 2 to RouteHops) {
        frontier = frontier.join(er, col("head") === col("e_src"))
          .filter(!array_contains(col("path"), col("e_dst")))
          .select(col("origin"), col("e_dst").as("head"),
            concat(col("path"), array(col("e_dst"))).as("path"),
            (col("px_prod") * col("e_px")).as("px_prod"),
            least(col("bneck"), col("e_vol")).as("bneck"))
        all = all.unionByName(frontier)
      }
      val w = Window.partitionBy("origin", "head")
        .orderBy(col("bneck").desc, col("px_prod").desc, col("path_str").asc)
      all
        .withColumn("path_str", concat_ws("->", col("path")))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_routes",
          count(lit(1)).over(Window.partitionBy("origin", "head")))
        .filter(col("rn") === 1 && col("origin") < 5)
        .select(col("origin").as("src"), col("head").as("dst"),
          (size(col("path")) - 1).cast("long").as("hops"),
          col("path_str").as("best_path"), col("px_prod").as("px"),
          col("bneck"), col("n_routes"))
        .orderBy("src", "dst")
    },
    withCtes(s"""$edgesCte,
      $rundownChainSql,
      vroutes AS (
        SELECT * FROM (
          WITH RECURSIVE walk(origin, head, path, px_prod, bneck) AS (
            SELECT src, dst, [src, dst], px, vol_in FROM k$RundownRounds
            UNION ALL
            SELECT w.origin, e.dst, list_append(w.path, e.dst),
              w.px_prod * e.px, LEAST(w.bneck, e.vol_in)
            FROM walk w JOIN k$RundownRounds e ON w.head = e.src
            WHERE NOT list_contains(w.path, e.dst)
              AND len(w.path) <= $RouteHops)
          SELECT origin, head, path, px_prod, bneck,
            list_aggregate(list_transform(path, x -> CAST(x AS VARCHAR)),
              'string_agg', '->') AS path_str
          FROM walk)),
      vbest AS (
        SELECT *,
          ROW_NUMBER() OVER (PARTITION BY origin, head
            ORDER BY bneck DESC, px_prod DESC, path_str ASC) AS rn,
          COUNT(*) OVER (PARTITION BY origin, head) AS n_routes
        FROM vroutes)
      SELECT origin AS src, head AS dst,
        CAST(len(path) - 1 AS BIGINT) AS hops, path_str AS best_path,
        px_prod AS px, bneck, n_routes
      FROM vbest WHERE rn = 1 AND origin < 5 ORDER BY 1, 2"""))

  /** G5: subgraph registry cache — edges observed per block-epoch, and how
    * many are reused from the previous epoch (the cross-block cache-hit
    * shape of graphs/registry.rs). */
  private val g5RegistryCache = QueryDef(
    "g5_registry_cache",
    (s, dir) => {
      val perEpoch = ChainFixture.actionsTable(s, dir)
        .filter(col("action_type") === "swap" &&
          col("amount_in").isNotNull && col("amount_out").isNotNull)
        .select(expr("block_number div 100").as("epoch"),
          col("token_in_id").as("src"), col("token_out_id").as("dst"))
        .distinct().persist()
      val prev = perEpoch.select((col("epoch") + 1).as("p_epoch"),
        col("src").as("p_src"), col("dst").as("p_dst"))
      perEpoch
        .join(prev, col("epoch") === col("p_epoch") &&
          col("src") === col("p_src") && col("dst") === col("p_dst"), "left")
        .groupBy(col("epoch"))
        .agg(count(lit(1)).as("n_edges"),
          sum(when(col("p_src").isNotNull, 1L).otherwise(0L)).as("n_reused"))
        .orderBy("epoch")
    },
    withCtes("""pe AS (
        SELECT DISTINCT block_number // 100 AS epoch,
          token_in_id AS src, token_out_id AS dst
        FROM actions
        WHERE action_type = 'swap' AND amount_in IS NOT NULL AND amount_out IS NOT NULL)
      SELECT pe.epoch, COUNT(*) AS n_edges,
        CAST(SUM(CASE WHEN pv.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_reused
      FROM pe LEFT JOIN pe pv
        ON pv.epoch + 1 = pe.epoch AND pv.src = pe.src AND pv.dst = pe.dst
      GROUP BY 1 ORDER BY 1"""))

  /** Path of the persisted verified-subgraph registry for [[g5CrossRunCache]]
    * (exposed for the cache-hit test). */
  private[graft] def g5CachePath(s: SparkSession, dir: String): String =
    s"${ChainFixture.matRoot(s)}_g5reg_${ChainFixture.dirKey(dir)}"

  /** G5 (cross-run form): the verified-subgraph REGISTRY persisted across
    * runs (graphs/registry.rs:34-120 semantics — verified subgraphs live in
    * a registry, get REUSED until they expire, and are pruned
    * `prune_dead_subgraphs`-style past a block horizon). The registry table
    * is built once per fixture and atomically published under `matRoot`
    * ([[ChainFixture.materializeWith]]); every later call — and every later
    * RUN sharing the matRoot — reads the parquet instead of recomputing
    * (the cache-hit arm is asserted in DomainSpec). The query itself
    * reports registry composition per epoch: total cached subgraphs,
    * verified ones (seen in ≥2 distinct blocks — the subgraph_verifier
    * bar), still-live ones (within the 2-epoch expiry horizon of the
    * fixture tip), and expired-but-cached ones awaiting pruning. */
  private val g5CrossRunCache = QueryDef(
    "g5_cross_run_cache",
    (s, dir) => {
      val reg = ChainFixture.materializeWith(s, g5CachePath(s, dir)) { p =>
        ChainFixture.actionsTable(s, dir)
          .filter(col("action_type") === "swap" &&
            col("amount_in").isNotNull && col("amount_out").isNotNull)
          .select(expr("block_number div 100").as("epoch"),
            col("token_in_id").as("src"), col("token_out_id").as("dst"),
            col("block_number"))
          .groupBy("epoch", "src", "dst")
          .agg(countDistinct(col("block_number")).as("n_blocks"),
            count(lit(1)).as("n_obs"))
          .write.mode("overwrite").parquet(p)
      }
      val tip = reg.groupBy().agg(max(col("epoch")).as("tip_epoch"))
      reg.crossJoin(broadcast(tip))
        .groupBy(col("epoch"))
        .agg(count(lit(1)).as("n_subgraphs"),
          sum(when(col("n_blocks") >= 2, 1L).otherwise(0L)).as("n_verified"),
          sum(when(col("n_blocks") >= 2 && col("epoch") >= col("tip_epoch") - 2, 1L)
            .otherwise(0L)).as("n_live"),
          sum(when(col("n_blocks") >= 2 && col("epoch") < col("tip_epoch") - 2, 1L)
            .otherwise(0L)).as("n_expired"),
          sum(col("n_obs")).as("n_observations"))
        .orderBy("epoch")
    },
    withCtes("""reg AS (
        SELECT block_number // 100 AS epoch, token_in_id AS src,
          token_out_id AS dst, COUNT(DISTINCT block_number) AS n_blocks,
          COUNT(*) AS n_obs
        FROM actions
        WHERE action_type = 'swap' AND amount_in IS NOT NULL
          AND amount_out IS NOT NULL
        GROUP BY 1, 2, 3),
      tip AS (SELECT MAX(epoch) AS tip_epoch FROM reg)
      SELECT epoch, COUNT(*) AS n_subgraphs,
        CAST(SUM(CASE WHEN n_blocks >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_verified,
        CAST(SUM(CASE WHEN n_blocks >= 2 AND epoch >= tip_epoch - 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
        CAST(SUM(CASE WHEN n_blocks >= 2 AND epoch < tip_epoch - 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
        CAST(SUM(n_obs) AS BIGINT) AS n_observations
      FROM reg CROSS JOIN tip
      GROUP BY 1 ORDER BY 1"""))

  /** G6: per-tx-index price emission — DexQuotes rows (pool, block, tx_idx,
    * pre, post): post = the tx's observed rate, pre = previous emission via
    * lag over the per-pool ordered stream (the cumulative pool-state fold;
    * in production the window key is (pool, block-range) so no single pool
    * serializes a whole backfill). */
  private val g6PriceEmission = QueryDef(
    "g6_price_emission",
    (s, dir) => {
      val q = ChainFixture.actionsTable(s, dir)
        .filter(col("action_type") === "swap" &&
          col("amount_in").isNotNull && col("amount_out").isNotNull &&
          col("pool").isNotNull)
        .groupBy("pool", "block_number", "tx_idx")
        .agg(dsum(col("amount_out")).as("so"), dsum(col("amount_in")).as("si"))
        .withColumn("post", col("so") / col("si"))
      val w = Window.partitionBy("pool").orderBy("block_number", "tx_idx")
      q.withColumn("pre", lag(col("post"), 1).over(w))
        .groupBy("pool")
        .agg(count(lit(1)).as("n_emissions"),
          dsumR(col("post")).as("sum_post"),
          dsumR(col("pre")).as("sum_pre"),
          sum(when(col("pre").isNull, 1L).otherwise(0L)).as("n_first"))
        .orderBy("pool")
    },
    withCtes(s"""q AS (
        SELECT pool, block_number, tx_idx,
          ${sqlSum("amount_out")} / ${sqlSum("amount_in")} AS post
        FROM actions
        WHERE action_type = 'swap' AND amount_in IS NOT NULL
          AND amount_out IS NOT NULL AND pool IS NOT NULL
        GROUP BY 1, 2, 3),
      em AS (
        SELECT pool, post, LAG(post) OVER (
          PARTITION BY pool ORDER BY block_number, tx_idx) AS pre
        FROM q)
      SELECT pool, COUNT(*) AS n_emissions,
        ${sqlSumR("post")} AS sum_post, ${sqlSumR("pre")} AS sum_pre,
        CAST(SUM(CASE WHEN pre IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_first
      FROM em GROUP BY 1 ORDER BY 1"""))
}
