package graft.streaming

import graft.{QueryDef, QueryModule}
import graft.domain.ChainFixture
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch-equivalence oracle for the streaming trio (SURVEY §2.9 R2/R5 +
  * §2.1 S5): the tip pipeline's stateful per-pool fold is deterministic and
  * SQL-expressible, so the REAL Structured Streaming query (parquet-drop
  * file source → flatMapGroupsWithState → parquet sink, one micro-batch per
  * single-file drop) can be hash-checked against a relational DuckDB
  * formulation of the same fold — closing the "streaming path untested vs
  * oracle" gap with a genuine streamed execution, not a batch stand-in.
  * EVERY entry here is file-driven: source discovery, checkpointing, and
  * the sink sit on the measured path, and there is no driver-side collect
  * of fact-sized data anywhere in the harness — what the bench times is the
  * operator.
  *
  * Input updates are pre-rolled to one row per (pool, block, tx) so the
  * fold's (block, txIdx) sort is a TOTAL order and the emission sequence is
  * engine-independent. The stream is driven in three block-range
  * micro-batches, so state (prePx, nUpdates) must carry across batch
  * boundaries to match the oracle's windows — that carry IS what this
  * entry verifies.
  */
object StreamOracle extends QueryModule {

  def defs: Seq[QueryDef] =
    Seq(r5StreamFold, r4StreamWindow, r5TickFold, r4LateData, s5WriteBehind,
      c3StreamDiscovery, d8StreamDedup, r8StreamJoin, r8OuterJoin,
      d17StreamLineDedup, w9StreamSession)

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Register a staging directory for recursive deletion at JVM exit —
    * Verify/Bench run in one JVM per invocation, so each process cleans
    * its own /tmp footprint without racing lazy readers of the data.
    * ONE hook drains a shared queue: registering a hook per run would
    * accumulate unbounded Thread objects across a 147-query suite. */
  private val exitDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val exitHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      exitDirs.forEach(d => rm(new java.io.File(d)))
    }))
  private[streaming] def deleteOnExit(dir: String): Unit = { exitHook; exitDirs.add(dir): Unit }

  private def withCtes(sql: String) = Some(s"WITH ${ChainFixture.sqlCtes} $sql")
  /** Like [[withCtes]] but RECURSIVE — for oracles splicing in the
    * TickSql integer-chain CTEs. */
  private def withCtesRec(sql: String) =
    Some(s"WITH RECURSIVE ${ChainFixture.sqlCtes} $sql")

  /** Deduplicated pool updates: one per (pool, block, tx), px = first
    * leg's rate, vol = exact decimal sum of inputs. */
  private def updates(s: SparkSession, dir: String): DataFrame =
    ChainFixture.actionsTable(s, dir)
      .filter(col("action_type") === "swap" && col("pool").isNotNull &&
        col("amount_in").isNotNull && col("amount_out").isNotNull)
      .groupBy(col("pool"), col("block_number").as("block"),
        col("tx_idx").as("txIdx"))
      .agg(min_by(col("amount_out") / col("amount_in"), col("trace_idx")).as("px"),
        graft.ops.ExactAgg.dsum(col("amount_in")).as("vol"))

  /** Tercile batch tag by block: 0 / 1 / 2 cut at maxBlock/3 and
    * 2·maxBlock/3 — the micro-batch composition every fold entry shares,
    * computed from a one-row agg (no fact-sized driver action). */
  private def withBlockTerciles(in: DataFrame): DataFrame = {
    // persist across the two consumers (the max-block action here, the
    // drop writes in driveFold): the update derivation is an actions-store
    // scan + aggregate that otherwise runs twice; the harness clears the
    // cache between queries
    val p = in.persist()
    val mbRow = p.agg(max(col("block"))).head()
    val mb = if (mbRow.isNullAt(0)) 0L else mbRow.getLong(0)
    val (cut1, cut2) = (mb / 3, 2 * mb / 3)
    p.withColumn("batch",
      when(col("block") <= cut1, 0L)
        .when(col("block") <= cut2, 1L).otherwise(2L))
  }

  /** Drive a ONE-sided parquet-drop FILE stream (the `s5_write_behind`
    * pattern, shared by the r4/r5 fold entries): the input frame carries a
    * `batch` column; each batch lands as a single-file parquet append under
    * the src dir while the query runs, so every drop is one micro-batch and
    * the state carry across drops is what the entry verifies. `transform`
    * builds the streaming plan on a CLONED session pinned to the
    * stream-local shuffle-partition count; the output parquet is read back
    * on the MAIN session. No driver-side collect anywhere. */
  private def driveFold(s: SparkSession, in: DataFrame, nBatches: Long,
      tag: String)(
      transform: (SparkSession, DataFrame) => DataFrame): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    deleteOnExit(tmp)
    val (src, out, ckpt) = (s"$tmp/src", s"$tmp/out", s"$tmp/ckpt")
    val data = in.persist()
    try {
      data.filter(col("batch") === 0L).drop("batch")
        .coalesce(1).write.parquet(src)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", StreamShufflePartitions)
      val stream = s2.readStream.schema(in.drop("batch").schema).parquet(src)
      val q = transform(s2, stream)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        (1L until nBatches).foreach { i =>
          data.filter(col("batch") === i).drop("batch")
            .coalesce(1).write.mode("append").parquet(src)
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally { data.unpersist(false); () }
    s.read.parquet(out)
  }

  private val r5StreamFold = QueryDef(
    "r5_stream_fold",
    (s, dir) => {
      // three single-file drops in block order — the fold's state must
      // carry across the micro-batch boundaries
      val batched = withBlockTerciles(updates(s, dir))
      def tick(c: org.apache.spark.sql.Column) =
        graft.functions.TickMath.tick_at_rate(c)
      driveFold(s, batched, 3, "r5f") { (s2, stream) =>
        import s2.implicits._
        TipStream.poolQuotes(stream.as[TipStream.PoolUpdate]).toDF()
      }
        .select(col("pool"), col("block"), col("prePx"), col("postPx"),
          col("nUpdates").as("n_updates"),
          (col("prePx").isNotNull &&
            tick(col("prePx")) =!= tick(col("postPx"))).as("crossed"))
        .withColumnRenamed("prePx", "pre_px")
        .withColumnRenamed("postPx", "post_px")
        .orderBy("pool", "n_updates")
    },
    withCtesRec(foldOracleSql))

  /** The relational form of the pool fold — shared by `r5_stream_fold`
    * (MemoryStream drive) and `s5_write_behind` (file-follower drive):
    * both streamed executions must hash to this same DuckDB fold. */
  // lazy: referenced by r5StreamFold, which is declared earlier in the object
  private lazy val foldOracleSql = s""", upd AS (
        SELECT pool, block_number AS block, tx_idx,
          ARG_MIN(amount_out / amount_in, trace_idx) AS px
        FROM actions
        WHERE action_type = 'swap' AND pool IS NOT NULL
          AND amount_in IS NOT NULL AND amount_out IS NOT NULL
        GROUP BY 1, 2, 3),
      ${graft.queries.TickSql.tickAtRateCtes("fdi",
        "SELECT pool, block, tx_idx, px AS rate FROM upd",
        Seq("pool", "block", "tx_idx"))},
      updt AS (
        SELECT u.*, t.tick FROM upd u JOIN fditick t
          ON t.pool = u.pool AND t.block = u.block AND t.tx_idx = u.tx_idx),
      fold AS (
        SELECT pool, block, LAG(px) OVER w AS pre_px, px AS post_px,
          LAG(tick) OVER w AS pre_tick, tick AS post_tick,
          ROW_NUMBER() OVER w AS n_updates
        FROM updt
        WINDOW w AS (PARTITION BY pool ORDER BY block, tx_idx))
      SELECT pool, block, pre_px, post_px, n_updates,
        (pre_px IS NOT NULL AND pre_tick <> post_tick) AS crossed
      FROM fold ORDER BY pool, n_updates"""

  /** C3 in tip mode (the streaming discovery upsert): factory NEW-POOL
    * events ride the same file stream as the swap updates, and the
    * registry is the fold's KEYED STATE ([[TipStream.registeredQuotes]]) —
    * a pool deployed mid-stream starts pricing at its discovery event,
    * earlier updates surface as `priced = false` quarantine rows, and the
    * registration→pricing carry across micro-batch boundaries is exactly
    * what the three tercile drops verify. Each pool's deploy block is the
    * deterministic `(pool_id · 97) mod (max_block + 1)` spread, so every
    * arm is live: pools registered before their first update, after their
    * last, and mid-history. Oracle: the same fold over ONLY the
    * post-deploy updates, unioned with the pre-deploy quarantine rows. */
  private val c3StreamDiscovery = QueryDef(
    "c3_stream_discovery",
    (s, dir) => {
      val upd = updates(s, dir).persist() // max-block action + the union feed
      val mbRow = upd.agg(max(col("block"))).head()
      val mb = if (mbRow.isNullAt(0)) 0L else mbRow.getLong(0)
      val dep = ChainFixture.pools(s)
        .select(col("address").as("pool"),
          (col("pool_id") * 97 % (mb + 1)).as("block"),
          lit(-1L).as("txIdx"), lit(true).as("isNew"),
          lit(0.0).as("px"), lit(0.0).as("vol"))
      // both oracle arms inner-join updates to the registry-derived deploy
      // table, so an update whose pool is absent from the pool dimension has
      // no oracle counterpart — semi-join the stream's updates to the same
      // dimension so neither engine ever sees an unregistered pool key (the
      // fixture's dispatched swaps can't produce one today; this pins the
      // contract structurally rather than by fixture accident)
      val ev = upd.withColumn("isNew", lit(false))
        .select("pool", "block", "txIdx", "isNew", "px", "vol")
        .join(ChainFixture.pools(s).select(col("address").as("pool")),
          Seq("pool"), "left_semi")
        .unionByName(dep)
      driveFold(s, withBlockTerciles(ev), 3, "c3sd") { (s2, stream) =>
        import s2.implicits._
        TipStream.registeredQuotes(stream.as[TipStream.RegEvent]).toDF()
      }
        .select(col("pool"), col("block"), col("txIdx").as("tx_idx"),
          col("priced"), col("prePx").as("pre_px"),
          col("postPx").as("post_px"), col("nUpdates").as("n_updates"))
        .orderBy("pool", "block", "tx_idx")
    },
    withCtes(s""", upd AS (
        SELECT pool, block_number AS block, tx_idx,
          ARG_MIN(amount_out / amount_in, trace_idx) AS px
        FROM actions
        WHERE action_type = 'swap' AND pool IS NOT NULL
          AND amount_in IS NOT NULL AND amount_out IS NOT NULL
        GROUP BY 1, 2, 3),
      sd_mb AS (SELECT MAX(block) AS mb FROM upd),
      sd_dep AS (
        SELECT address AS pool, (pool_id * 97) % (mb + 1) AS dep_block
        FROM pool, sd_mb),
      sd_pr AS (
        SELECT u.* FROM upd u JOIN sd_dep d ON d.pool = u.pool
        WHERE u.block >= d.dep_block),
      sd_fold AS (
        SELECT pool, block, tx_idx, true AS priced,
          LAG(px) OVER w AS pre_px, px AS post_px,
          ROW_NUMBER() OVER w AS n_updates
        FROM sd_pr
        WINDOW w AS (PARTITION BY pool ORDER BY block, tx_idx))
      SELECT pool, block, tx_idx, priced, pre_px, post_px, n_updates
      FROM sd_fold
      UNION ALL
      SELECT u.pool, u.block, u.tx_idx, false AS priced,
        CAST(NULL AS DOUBLE) AS pre_px, u.px AS post_px,
        CAST(0 AS BIGINT) AS n_updates
      FROM upd u JOIN sd_dep d ON d.pool = u.pool
      WHERE u.block < d.dep_block
      ORDER BY pool, block, tx_idx"""))

  /** S5 (oracle-checked end-to-end): the R2 tip follower with the
    * write-behind sink — a REAL file-source stream (three parquet drops
    * land at the "tip" while the query runs), checkpointed, each
    * micro-batch appended through `foreachBatch` — then the write-behind
    * OUTPUT is read back and hash-compared against the same relational
    * fold oracle as `r5_stream_fold`. This closes the loop the MemoryStream
    * entry can't: source discovery, checkpoint recovery metadata, and the
    * ordered sink all sit on the verified path. Input is pre-rolled to the
    * total-order (pool, block, tx) grain so emission is deterministic. */
  private val s5WriteBehind = QueryDef(
    "s5_write_behind",
    (s, dir) => {
      val upd = updates(s, dir).persist()
      val mbRow = upd.agg(max(col("block"))).head()
      val maxBlock = if (mbRow.isNullAt(0)) 0L else mbRow.getLong(0)
      val cut1 = maxBlock / 3
      val cut2 = 2 * maxBlock / 3
      // cleaned up at JVM exit, not here: the returned DataFrame reads the
      // write-behind output lazily, so the files must outlive this builder
      val tmp = java.nio.file.Files.createTempDirectory("graft_s5").toString
      deleteOnExit(tmp)
      val (src, out, ckpt) = (s"$tmp/src", s"$tmp/out", s"$tmp/ckpt")
      // each drop is ONE file: the follower triggers continuously, and a
      // multi-file drop can be discovered mid-move — half the files land in
      // one micro-batch, half in the next, and because part files are hash
      // slices the per-pool block order breaks. A single file appears
      // atomically to the source's listing, so every drop is exactly one
      // whole unit regardless of trigger timing.
      upd.filter(col("block") <= cut1).coalesce(1).write.parquet(src)
      // stream-local shuffle-partition pinning, same as driveFold /
      // driveTwoSided: this was the ONE streamed entry still running its
      // stateful fold on the main session's 32 shuffle partitions — 32
      // state-store commits per micro-batch for state this small
      val s2 = s.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", StreamShufflePartitions)
      val q = TipStream.runTipRolled(s2, src, out, ckpt)
      try {
        q.processAllAvailable()
        upd.filter(col("block") > cut1 && col("block") <= cut2)
          .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        upd.filter(col("block") > cut2)
          .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
      } finally q.stop()
      upd.unpersist(false)
      def tick(c: org.apache.spark.sql.Column) =
        graft.functions.TickMath.tick_at_rate(c)
      s.read.parquet(out)
        .select(col("pool"), col("block"), col("prePx"), col("postPx"),
          col("nUpdates").as("n_updates"),
          (col("prePx").isNotNull &&
            tick(col("prePx")) =!= tick(col("postPx"))).as("crossed"))
        .withColumnRenamed("prePx", "pre_px")
        .withColumnRenamed("postPx", "post_px")
        .orderBy("pool", "n_updates")
    },
    withCtesRec(foldOracleSql))

  /** R5 (V3 tick-liquidity arm): the REAL streamed per-tick state fold —
    * mint/burn events mutate per-range liquidity (exact integer
    * micro-units), swaps walk ranges from the PRE-price tick through
    * f10_tick_cross's kernel against the liquidity AS OF that event
    * (uniswap_v3_math/{tick_math,tick_bitmap}.rs). Three micro-batches cut
    * by block, so both the last-price AND the liquidity map must carry
    * across batch boundaries. Ticks and boundary √prices are EXACT Q64.96
    * (TickMath / TickSql — no linearization). The DuckDB oracle rebuilds
    * the same fold relationally: a BIGINT window sum for per-range
    * liquidity, an ASOF join for liquidity-as-of-swap, exact ticks from
    * the candidate-corrected integer chain, and the f10 walk (window
    * cumsum in k-descending order); per-range outputs snap to integer
    * micro-units so every aggregate is order-free. */
  private val r5TickFold = QueryDef(
    "r5_tick_fold",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val vp = ChainFixture.pools(s).filter(col("protocol") === "uniswap_v3")
        .select(col("pool_id"), col("address"))
      val acts = ChainFixture.actionsTable(s, dir)
        .join(vp, col("pool") === col("address"))
      val sev = acts.filter(col("action_type") === "swap" &&
          col("amount_in").isNotNull && col("amount_out").isNotNull)
        .groupBy(col("pool_id").as("pool"), col("block_number").as("block"),
          col("tx_idx").as("txIdx"))
        .agg(min_by(col("amount_out") / col("amount_in"), col("trace_idx")).as("px"),
          graft.ops.ExactAgg.dsum(col("amount_in")).as("vol"))
        .select(col("pool"), col("block"), col("txIdx"), lit(2).as("kind"),
          lit(0L).as("k"), lit(0L).as("deltaMicro"), col("px"), col("vol"))
      val lev = acts.filter(col("action_type").isin("mint", "burn") &&
          col("amount_in").isNotNull)
        .groupBy(col("pool_id").as("pool"), col("block_number").as("block"),
          col("tx_idx").as("txIdx"),
          when(col("action_type") === "mint", 0).otherwise(1).as("kind"))
        .agg((sum(col("amount_in").cast(DecimalType(38, 6))) * 1000000)
          .cast("long").as("mag"))
        .select(col("pool"), col("block"), col("txIdx"), col("kind"),
          (col("txIdx") % 16 - 8).as("k"),
          when(col("kind") === 0, col("mag")).otherwise(-col("mag"))
            .as("deltaMicro"),
          lit(0.0).as("px"), lit(0.0).as("vol"))
      val batched = withBlockTerciles(sev.unionByName(lev))
      driveFold(s, batched, 3, "r5t") { (s2, stream) =>
        import s2.implicits._
        TipStream.tickQuotes(stream.as[TipStream.TickEvent]).toDF()
      }
        .groupBy(col("pool").as("pool_id"))
        .agg(count(lit(1)).as("n_priced"),
          sum(col("nCrossed")).as("n_crossed"),
          sum(when(col("exhausted"), 1L).otherwise(0L)).as("n_exhausted"),
          sum(when(col("tickMoved"), 1L).otherwise(0L)).as("n_tick_moved"),
          sum(col("outMicro")).as("sum_out_micro"))
        .orderBy("pool_id")
    },
    withCtesRec(s""", vpt AS (
        SELECT pool_id, address FROM pool WHERE protocol = 'uniswap_v3'),
      sevt AS (
        SELECT p.pool_id, a.block_number AS block, a.tx_idx,
          ARG_MIN(a.amount_out / a.amount_in, a.trace_idx) AS px,
          CAST(CAST(SUM(CAST(a.amount_in AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS vol
        FROM actions a JOIN vpt p ON a.pool = p.address
        WHERE a.action_type = 'swap' AND a.amount_in IS NOT NULL
          AND a.amount_out IS NOT NULL
        GROUP BY 1, 2, 3),
      levt AS (
        SELECT pool_id, block, tx_idx, kind, k,
          (1 - 2 * kind) * mag AS delta_micro
        FROM (
          SELECT p.pool_id, a.block_number AS block, a.tx_idx,
            CASE WHEN a.action_type = 'mint' THEN 0 ELSE 1 END AS kind,
            (a.tx_idx % 16) - 8 AS k,
            CAST(SUM(CAST(a.amount_in AS DECIMAL(38,6))) * 1000000 AS BIGINT)
              AS mag
          FROM actions a JOIN vpt p ON a.pool = p.address
          WHERE a.action_type IN ('mint','burn') AND a.amount_in IS NOT NULL
          GROUP BY 1, 2, 3, 4, 5)),
      lcum AS (
        SELECT pool_id, k, block * 64 + tx_idx * 4 + kind AS ord,
          SUM(delta_micro) OVER (PARTITION BY pool_id, k
            ORDER BY block, tx_idx, kind ROWS UNBOUNDED PRECEDING) AS cum_micro
        FROM levt),
      spre AS (
        SELECT *, LAG(px) OVER (PARTITION BY pool_id ORDER BY block, tx_idx)
          AS pre_px
        FROM sevt),
      r5rt AS (
        SELECT pool_id, block, tx_idx, 0 AS which, pre_px AS rate
        FROM spre WHERE pre_px IS NOT NULL
        UNION ALL
        SELECT pool_id, block, tx_idx, 1 AS which, px AS rate
        FROM spre WHERE pre_px IS NOT NULL),
      ${graft.queries.TickSql.tickAtRateCtes("r5i",
        "SELECT pool_id, block, tx_idx, which, rate FROM r5rt",
        Seq("pool_id", "block", "tx_idx", "which"))},
      ${graft.queries.TickSql.ratioCtes("r5b",
        "SELECT k AS tick FROM range(-80, 81) t(k)")},
      swt AS (
        SELECT s.pool_id, s.block, s.tx_idx, s.px, s.vol * 0.997e0 AS amt_eff,
          s.block * 64 + s.tx_idx * 4 + 2 AS ord,
          ((tp.tick % 80) + 80) % 80 - 40 AS cur_t,
          (tp.tick <> tc.tick) AS tick_moved
        FROM spre s
        JOIN r5itick tp ON tp.pool_id = s.pool_id AND tp.block = s.block
          AND tp.tx_idx = s.tx_idx AND tp.which = 0
        JOIN r5itick tc ON tc.pool_id = s.pool_id AND tc.block = s.block
          AND tc.tx_idx = s.tx_idx AND tc.which = 1
        WHERE s.pre_px IS NOT NULL
          AND tp.tick IS NOT NULL AND tc.tick IS NOT NULL),
      swkt AS (
        SELECT s.*, r.k FROM swt s JOIN range(-8, 8) r(k)
          ON r.k * 10 <= s.cur_t),
      swklt AS (
        SELECT s.*, COALESCE(l.cum_micro, 0) AS cum_micro
        FROM swkt s ASOF LEFT JOIN lcum l
          ON s.pool_id = l.pool_id AND s.k = l.k AND s.ord >= l.ord),
      twk0 AS (
        SELECT w.pool_id, w.block, w.tx_idx, w.amt_eff, w.tick_moved, w.k,
          (10000.0e0 + w.pool_id * 1000.0e0 + ABS(w.k) * 500.0e0)
            + w.cum_micro / 1000000.0e0 AS liq,
          bs.px AS s_px, be.px AS e_px
        FROM swklt w
        JOIN r5bpx be ON be.tick = w.k * 10
        JOIN r5bpx bs ON bs.tick = LEAST((w.k + 1) * 10, w.cur_t)),
      twk1 AS (
        SELECT *, liq * (1.0e0 / e_px - 1.0e0 / s_px) AS cap,
          COALESCE(SUM(liq * (1.0e0 / e_px - 1.0e0 / s_px)) OVER (
            PARTITION BY pool_id, block, tx_idx ORDER BY k DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0e0) AS cum
        FROM twk0),
      twk2 AS (
        SELECT *, (cum + cap <= amt_eff) AS is_full,
          CASE WHEN cum + cap <= amt_eff THEN liq * (s_px - e_px)
               ELSE liq * (s_px - 1.0e0 / (1.0e0 / s_px + (amt_eff - cum) / liq))
          END AS out_tok1
        FROM twk1 WHERE cum < amt_eff),
      twk3 AS (
        SELECT pool_id, block, tx_idx,
          CAST(SUM(CASE WHEN is_full THEN 1 ELSE 0 END) AS BIGINT) AS n_crossed,
          BOOL_OR(is_full AND k = -8) AS exhausted,
          BOOL_OR(tick_moved) AS tick_moved,
          CAST(SUM(CAST(FLOOR(out_tok1 * 1.0e6 + 0.5e0) AS BIGINT)) AS BIGINT)
            AS out_micro
        FROM twk2 GROUP BY 1, 2, 3)
      SELECT pool_id, COUNT(*) AS n_priced,
        CAST(SUM(n_crossed) AS BIGINT) AS n_crossed,
        CAST(SUM(CASE WHEN exhausted THEN 1 ELSE 0 END) AS BIGINT) AS n_exhausted,
        CAST(SUM(CASE WHEN tick_moved THEN 1 ELSE 0 END) AS BIGINT) AS n_tick_moved,
        CAST(SUM(out_micro) AS BIGINT) AS sum_out_micro
      FROM twk3 GROUP BY 1 ORDER BY 1"""))

  /** R4 batch-equivalence: the REAL streamed 2-block sliding window
    * (parquet-drop file source → flatMapGroupsWithState → parquet sink,
    * three micro-batches cut mid-stream so the previous-block state must
    * carry across batch boundaries) against a LAG-window DuckDB
    * formulation. Input is (pool, block)-grain decimal-exact volumes, so
    * the window total is a single deterministic IEEE addition on both
    * engines. */
  private val r4StreamWindow = QueryDef(
    "r4_stream_window",
    (s, dir) => {
      val blocks = updates(s, dir)
        .groupBy(col("pool"), col("block"))
        .agg(graft.ops.ExactAgg.dsum(col("vol")).as("vol"),
          count(lit(1)).as("n"))
      driveFold(s, withBlockTerciles(blocks), 3, "r4w") { (s2, stream) =>
        import s2.implicits._
        TipStream.blockWindows(stream.as[TipStream.BlockVol]).toDF()
      }
        .select(col("pool"), col("block"), col("wndVol").as("wnd_vol"),
          col("wndN").as("wnd_n"), col("blksInWnd").as("blks_in_wnd"))
        .orderBy("pool", "block")
    },
    withCtes(""", upd AS (
        SELECT pool, block_number AS block, tx_idx,
          CAST(CAST(SUM(CAST(amount_in AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS vol
        FROM actions
        WHERE action_type = 'swap' AND pool IS NOT NULL
          AND amount_in IS NOT NULL AND amount_out IS NOT NULL
        GROUP BY 1, 2, 3),
      blk AS (
        SELECT pool, block,
          CAST(CAST(SUM(CAST(vol AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS vol,
          COUNT(*) AS n
        FROM upd GROUP BY 1, 2),
      wnd AS (
        SELECT pool, block,
          CASE WHEN LAG(block) OVER w = block - 1
               THEN LAG(vol) OVER w + vol ELSE vol END AS wnd_vol,
          CAST(CASE WHEN LAG(block) OVER w = block - 1
               THEN LAG(n) OVER w + n ELSE n END AS BIGINT) AS wnd_n,
          CASE WHEN LAG(block) OVER w = block - 1 THEN 2 ELSE 1 END AS blks_in_wnd
        FROM blk WINDOW w AS (PARTITION BY pool ORDER BY block))
      SELECT * FROM wnd ORDER BY pool, block"""))

  /** R4 (watermark/late-data arm): REAL event-time tumbling windows with
    * `withWatermark` in Append mode, driven through four out-of-order
    * micro-batches — a deterministic slice of rows arrives one batch LATE.
    * The engine must (a) merge late rows whose window the watermark hasn't
    * closed, (b) DROP late rows whose window end is at or below the
    * watermark, and (c) only emit a window once the watermark passes its
    * end (a far-future sentinel event flushes the tail). Because the batch
    * composition and the chain clock are deterministic, the drop set is
    * relational: the DuckDB oracle recomputes per-batch watermarks
    * (max event time over earlier batches − delay) and aggregates the
    * surviving rows — so a divergence in ANY of the three semantics breaks
    * the hash. Spark tracks watermarks in milliseconds; every event time
    * here is whole ms (1 s per block + 1 ms per tx) so the µs-domain oracle
    * arithmetic is exact. */
  private val r4LateData = QueryDef(
    "r4_late_data",
    (s, dir) => {
      val upd = updates(s, dir).persist() // max-block action + the unit rollup
      val mbRow = upd.agg(max(col("block"))).head()
      val maxBlock = if (mbRow.isNullAt(0)) 0L else mbRow.getLong(0)
      val cut1 = maxBlock / 3
      val cut2 = 2 * maxBlock / 3
      // partial-aggregate each batch to (pool, window) units before the
      // stateful shuffle (TipStream.WndUpdate): the drop/merge decision is
      // per (window, batch), the unit's event time is its max row's, and
      // vol accumulates through the same exact-decimal reduction — so the
      // output matches row-grain feeding bit-for-bit at a fraction of the
      // per-batch state traffic (this is the map-side combine a production
      // stream source would do). The bit-identity holds while a unit's
      // scale-6 sum round-trips through the carried double, i.e. under
      // ~15 significant digits — orders of magnitude above these per-
      // (pool, window, batch) sums; a pipeline combining to larger units
      // would carry the partial as DECIMAL instead.
      val units = upd
        .withColumn("batch",
          (when(col("block") <= cut1, 0L).when(col("block") <= cut2, 1L)
            .otherwise(2L) +
            // late slice: these rows arrive one batch after their tercile
            when((col("block") + col("txIdx")) % 5 === 2, 1L).otherwise(0L)))
        .groupBy(col("pool"),
          expr("(block * 1000000L + txIdx * 1000L) div 10000000L").as("wnd"),
          col("batch"))
        .agg(max(struct(col("block"), col("txIdx"))).as("mx"),
          graft.ops.ExactAgg.dsum(col("vol")).as("vol"),
          count(lit(1)).as("cnt"))
        .select(col("pool"), col("mx.block").as("block"),
          col("mx.txIdx").as("txIdx"), col("vol"), col("cnt"), col("batch"))
      // the far-future sentinel rides the LAST data batch: its ts only
      // enters the watermark after that batch, pushing it past every real
      // window so Append mode flushes them (its own window never finalizes,
      // and the trailing no-data micro-batch does the emit)
      val sentinel = s.range(1).select(lit("zz_sentinel").as("pool"),
        lit(maxBlock + 100000L).as("block"), lit(0L).as("txIdx"),
        lit(0.0).as("vol"), lit(0L).as("cnt"), lit(3L).as("batch"))
      driveFold(s, units.unionByName(sentinel), 4, "r4l") { (s2, stream) =>
        import s2.implicits._
        TipStream.lateWindowAgg(stream.as[TipStream.WndUpdate])
      }
        .filter(col("pool") =!= "zz_sentinel")
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("pool"), col("n"), col("sum_vol"))
        .orderBy("window_start_us", "pool")
    },
    withCtes(""", upd AS (
        SELECT pool, block_number AS block, tx_idx,
          CAST(CAST(SUM(CAST(amount_in AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS vol
        FROM actions
        WHERE action_type = 'swap' AND pool IS NOT NULL
          AND amount_in IS NOT NULL AND amount_out IS NOT NULL
        GROUP BY 1, 2, 3),
      mx AS (SELECT MAX(block) AS mb FROM upd),
      ev AS (
        SELECT pool, block * 1000000 + tx_idx * 1000 AS ts_us, vol,
          (CASE WHEN block <= mb // 3 THEN 1
                WHEN block <= 2 * mb // 3 THEN 2 ELSE 3 END)
          + (CASE WHEN (block + tx_idx) % 5 = 2 THEN 1 ELSE 0 END) AS batch
        FROM upd, mx),
      wm AS (
        -- per-batch watermark: max event time over EARLIER batches − 3.5 s
        -- (Spark's initial watermark is 0 and all window ends are > 0, so
        -- the first batch keeps everything on both engines)
        SELECT b.batch,
          COALESCE((SELECT MAX(e.ts_us) FROM ev e WHERE e.batch < b.batch),
            -3500000) - 3500000 AS wm_us
        FROM (SELECT DISTINCT batch FROM ev) b),
      kept AS (
        -- a row survives iff its 10 s window end is strictly above the
        -- watermark in force when its batch is processed
        SELECT e.pool, e.ts_us, e.vol
        FROM ev e JOIN wm ON wm.batch = e.batch
        WHERE (e.ts_us // 10000000) * 10000000 + 10000000 > wm.wm_us)
      SELECT (ts_us // 10000000) * 10000000 AS window_start_us, pool,
        COUNT(*) AS n,
        CAST(CAST(SUM(CAST(vol AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_vol
      FROM kept GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** R8: STREAM-STREAM event-time interval join — the two-sided-state
    * Structured Streaming primitive: view/click impressions join purchases
    * by the same user within a 6-hour attribution window, both sides
    * watermarked, Append-mode inner join, driven through three time-range
    * micro-batches. The watermark delay (48 h) strictly dominates the
    * interval against ~10-day batch strides, so — provably — no stored row
    * whose partner is still to come is evicted and no arriving row is
    * late-dropped: the streamed result equals the static interval join
    * EXACTLY, which is what makes the DuckDB oracle hash-exact while the
    * execution still exercises real cross-batch two-sided join state. The
    * cross-batch carry itself is pinned by a planted scenario in
    * StreamingSpec. */
  /** Impression-side unit — used by StreamingSpec's planted cross-batch
    * join scenarios (the registered queries are file-drop-driven). */
  case class ImpEvent(a_user: Long, a_type: String,
      a_ts: java.sql.Timestamp, batch: Long)
  /** Conversion-side unit (see [[ImpEvent]]). */
  case class ConvEvent(b_user: Long, b_value: Double,
      b_ts: java.sql.Timestamp, batch: Long)
  /** One pre-rolled dedup unit: content hash, arrival batch, min-doc
    * representative, event time (see [[ImpEvent]]). */
  case class DedupEvent(h: String, b: Long, rep: Long, ts: java.sql.Timestamp)

  /** Pre-rolled attribution inputs as FRAMES (no driver-side collect —
    * the batches land as parquet drops, so the operator, not the harness,
    * is what a scale run measures): each side tagged with its
    * time-tercile batch, plus the max event-time in micros. */
  private def attribFrames(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, Long) = {
    val ev = graft.Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"), col("value"))
    val r = ev.agg(min("us"), max("us")).head()
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    val third = (mx - mn) / 3 + 1
    val withBatch = ev
      .withColumn("batch", expr(s"(us - ${mn}L) div ${third}L"))
      .withColumn("tsc", expr("timestamp_micros(us)"))
    val imps = withBatch.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("a_user"), col("event_type").as("a_type"),
        col("tsc").as("a_ts"), col("batch"))
    val convs = withBatch.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("value").as("b_value"),
        col("tsc").as("b_ts"), col("batch"))
    (imps, convs, mx)
  }

  /** Stream-local shuffle-partition count: a stream-stream join commits
    * TWO state stores per shuffle partition per micro-batch; at the suite
    * default of 32 that is 192 store commits for three batches — far more
    * than this state volume needs (21.6 s → 5.5 s at sf0.1). Partition
    * count should track state VOLUME: tiny here, many partitions across
    * executors at cluster scale. The stream runs on a CLONED session
    * pinned to this value, so the suite-global setting is never touched
    * (not even transiently) and concurrently-planned batch queries are
    * unaffected. */
  private val StreamShufflePartitions = "4"

  /** Drive a two-sided parquet-drop FILE stream (the `s5_write_behind`
    * pattern): per-batch single-file appends land under src dirs while
    * the query runs — source discovery, checkpointing, and the parquet
    * sink all sit on the measured path, with no driver-side collect. The
    * joined output is read back on the MAIN session. */
  private def driveTwoSided(s: SparkSession, aDf: DataFrame, bDf: DataFrame,
      nBatches: Long, joinExpr: String, joinType: String,
      sentinel: Option[(DataFrame, DataFrame)], tag: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    deleteOnExit(tmp)
    val (srcA, srcB, out, ckpt) = (s"$tmp/a", s"$tmp/b", s"$tmp/out", s"$tmp/ckpt")
    // persist both sides for the drop-write phase (driveFold already does):
    // each of the 2×nBatches single-file writes otherwise re-derives its
    // side from the source scan
    val (aP, bP) = (aDf.persist(), bDf.persist())
    aP.filter(col("batch") === 0).drop("batch").coalesce(1).write.parquet(srcA)
    bP.filter(col("batch") === 0).drop("batch").coalesce(1).write.parquet(srcB)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", StreamShufflePartitions)
    val a = s2.readStream.schema(aDf.drop("batch").schema).parquet(srcA)
      .withWatermark("a_ts", "48 hours")
    val b = s2.readStream.schema(bDf.drop("batch").schema).parquet(srcB)
      .withWatermark("b_ts", "48 hours")
    val q = a.join(b, expr(joinExpr), joinType)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      (1L until nBatches).foreach { i =>
        aP.filter(col("batch") === i).drop("batch").coalesce(1)
          .write.mode("append").parquet(srcA)
        bP.filter(col("batch") === i).drop("batch").coalesce(1)
          .write.mode("append").parquet(srcB)
        q.processAllAvailable()
      }
      sentinel.foreach { case (sa, sb) =>
        sa.coalesce(1).write.mode("append").parquet(srcA)
        sb.coalesce(1).write.mode("append").parquet(srcB)
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      aP.unpersist(false); bP.unpersist(false); ()
    }
    s.read.parquet(out)
  }

  private val r8StreamJoin = QueryDef(
    "r8_stream_join",
    (s, dir) => {
      val (imps, convs, _) = attribFrames(s, dir)
      driveTwoSided(s, imps, convs, 3,
        """a_user = b_user AND b_ts >= a_ts
           AND b_ts <= a_ts + INTERVAL 6 HOURS""", "inner", None, "r8j")
        .withColumn("day", expr("unix_micros(b_ts) div 86400000000"))
        .groupBy("a_type", "day")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("a_user")).as("n_users"),
          graft.ops.ExactAgg.dsum(col("b_value")).as("sum_value"))
        .orderBy("a_type", "day")
    },
    Some(s"""WITH e AS (
        SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
        FROM events),
      pairs AS (
        SELECT a.event_type AS a_type, a.user_id AS a_user,
          b.us AS b_us, b.value AS b_value
        FROM e a JOIN e b
          ON a.user_id = b.user_id
          AND a.event_type IN ('view', 'click') AND b.event_type = 'purchase'
          AND b.us >= a.us AND b.us <= a.us + 21600000000)
      SELECT a_type, (b_us // 86400000000) AS day,
        COUNT(*) AS n_pairs,
        CAST(COUNT(DISTINCT a_user) AS BIGINT) AS n_users,
        ${graft.ops.ExactAgg.sqlSum("b_value")} AS sum_value
      FROM pairs GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** R8b: stream-stream LEFT OUTER interval join — the watermark-DRIVEN
    * emission path the inner join never exercises: an unmatched impression
    * emits its null-joined row only when the advancing watermark proves no
    * future purchase can land in its window (state eviction IS the
    * emission). A far-future sentinel batch on BOTH streams (non-joining:
    * the sentinel impression sits 7 h after the sentinel purchase) pushes
    * the final watermark past every real impression's window, so every
    * unmatched row flushes and the streamed result equals the static LEFT
    * OUTER join exactly — a hash-exact oracle over the eviction-emission
    * machinery. */
  private val r8OuterJoin = QueryDef(
    "r8_outer_join",
    (s, dir) => {
      val (imps, convs, mx) = attribFrames(s, dir)
      // sentinel flush: 100 days past the data, watermark sails past
      // every real window; the pair cannot join (imp 7 h after conv)
      val far = mx + 100L * 86400000000L
      val sentA = s.range(1).select(lit(-1L).as("a_user"),
        lit("view").as("a_type"),
        expr(s"timestamp_micros(${far + 7L * 3600000000L}L)").as("a_ts"))
      val sentB = s.range(1).select(lit(-1L).as("b_user"),
        lit(0.0).as("b_value"), expr(s"timestamp_micros(${far}L)").as("b_ts"))
      driveTwoSided(s, imps, convs, 3,
        """a_user = b_user AND b_ts >= a_ts
           AND b_ts <= a_ts + INTERVAL 6 HOURS""", "left_outer",
        Some((sentA, sentB)), "r8o")
        .filter(col("a_user") >= 0L)
        .groupBy("a_type")
        .agg(count(lit(1)).as("n_rows"),
          count(col("b_user")).as("n_matched"),
          (count(lit(1)) - count(col("b_user"))).as("n_unmatched"),
          graft.ops.ExactAgg.dsum(col("b_value")).as("sum_matched_value"))
        .orderBy("a_type")
    },
    Some(s"""WITH e AS (
        SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
        FROM events),
      lj AS (
        SELECT a.event_type AS a_type, b.user_id AS bu, b.value AS b_value
        FROM (SELECT user_id, event_type, us FROM e
              WHERE event_type IN ('view', 'click')) a
        LEFT JOIN (SELECT user_id, us, value FROM e
              WHERE event_type = 'purchase') b
          ON a.user_id = b.user_id
          AND b.us >= a.us AND b.us <= a.us + 21600000000)
      SELECT a_type, COUNT(*) AS n_rows,
        CAST(COUNT(bu) AS BIGINT) AS n_matched,
        CAST(COUNT(*) - COUNT(bu) AS BIGINT) AS n_unmatched,
        ${graft.ops.ExactAgg.sqlSum("b_value")} AS sum_matched_value
      FROM lj GROUP BY 1 ORDER BY 1"""))

  /** D8: STREAMING exact dedup — the ingest-time twin of `d1_exact_dedup`.
    * A corpus arrives in three micro-batches (doc_id % 3 — duplicates
    * straddle batches); the stream keeps the FIRST occurrence of each
    * content hash via `dropDuplicatesWithinWatermark`, the production API
    * whose state store is bounded by the watermark horizon (here 1 day
    * against a 2-hour event span, so nothing expires and the output is the
    * global first-seen set — at 100 TB/day the same query with a tighter
    * horizon bounds state to the dedup window instead of the corpus).
    * Each batch is pre-rolled to one unit per (hash, batch) with the
    * min-doc_id representative, so within-batch survivor choice is
    * deterministic and the entry verifies exactly the CROSS-BATCH state
    * carry. Output joins the kept rows back to the per-hash batch count —
    * n_dup_batches_dropped counts later-batch re-occurrences the state
    * suppressed. */
  private val d8StreamDedup = QueryDef(
    "d8_stream_dedup",
    (s, dir) => {
      val pre = graft.Tables.documents(s, dir)
        // head fingerprint, not the full text: this corpus has zero exact
        // full-text duplicates (d1 reports 0 clusters), so keying on the
        // 100-char head is what makes cross-batch suppression actually
        // fire (477 distinct heads over 500 docs at sf0.01)
        .select(md5(substring(col("text"), 1, 100)).as("h"),
          (col("doc_id") % 3).as("b"), col("doc_id"))
        .groupBy("h", "b").agg(min(col("doc_id")).as("rep"))
        .withColumn("ts", timestamp_micros(
          lit(1700000000000000L) + col("b") * 3600L * 1000000L))
        .persist()
      try {
        // file-source drive (s5_write_behind pattern): batches land as
        // single-file parquet drops — no driver-side collect, and source
        // discovery + checkpointing sit on the measured path
        val tmp = java.nio.file.Files.createTempDirectory("graft_d8").toString
        deleteOnExit(tmp)
        val (src, out, ckpt) = (s"$tmp/src", s"$tmp/out", s"$tmp/ckpt")
        pre.filter(col("b") === 0).coalesce(1).write.parquet(src)
        val s2 = s.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", StreamShufflePartitions)
        val q = s2.readStream.schema(pre.schema).parquet(src)
          .withWatermark("ts", "1 day")
          .dropDuplicatesWithinWatermark("h")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).start()
        try {
          q.processAllAvailable()
          (1L to 2L).foreach { b =>
            pre.filter(col("b") === b).coalesce(1)
              .write.mode("append").parquet(src)
            q.processAllAvailable()
          }
        } finally q.stop()
        val nb = pre.groupBy("h").agg(count(lit(1)).as("n_batches"))
        s.read.parquet(out)
          .join(nb, "h")
          .groupBy(col("b").as("batch"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("rep")).as("sum_doc_id"),
            sum(col("n_batches") - 1).as("n_dup_batches_dropped"))
          .orderBy("batch")
      } finally { pre.unpersist(false); () }
    },
    Some("""WITH pre AS (
        SELECT md5(substr(text, 1, 100)) AS h, doc_id % 3 AS b,
          MIN(doc_id) AS rep
        FROM documents GROUP BY 1, 2),
      nb AS (SELECT h, COUNT(*) AS n_batches FROM pre GROUP BY 1),
      first AS (SELECT h, MIN(b) AS b FROM pre GROUP BY 1),
      kept AS (
        SELECT p.h, p.b, p.rep FROM pre p
        JOIN first f ON f.h = p.h AND f.b = p.b)
      SELECT k.b AS batch, COUNT(*) AS n_kept,
        CAST(SUM(k.rep) AS BIGINT) AS sum_doc_id,
        CAST(SUM(n.n_batches - 1) AS BIGINT) AS n_dup_batches_dropped
      FROM kept k JOIN nb n ON n.h = k.h
      GROUP BY 1 ORDER BY 1"""))

  /** D17: STREAMING line-level dedup — the ingest-time twin of
    * `d15_line_dedup` and the online form of the CCNet pass: as the
    * corpus streams in, the FIRST occurrence of each 8-word line is kept
    * and every later re-occurrence (in later micro-batches or later in
    * the same batch) is dropped by `dropDuplicatesWithinWatermark` keyed
    * on the 16-byte line hash — bounded state at the watermark horizon,
    * exactly how a 100 TB/day ingest dedups boilerplate lines without a
    * corpus-wide join. Differs from d15 semantically as online dedup
    * must: d15 (batch, offline) removes a duplicated line from EVERY
    * document; the stream cannot revoke already-emitted output, so the
    * first carrier keeps its line. Pre-rolled to one unit per
    * (line-hash, batch) with the min-doc_id representative, so
    * within-batch survivor choice is deterministic and the entry
    * verifies the CROSS-BATCH state carry; `sum_chars_kept` checksums
    * the surviving CONTENT, not just counts. */
  private val d17StreamLineDedup = QueryDef(
    "d17_stream_line_dedup",
    (s, dir) => {
      val pre = graft.Tables.documents(s, dir)
        .withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"), (col("doc_id") % 3).as("b"),
          posexplode(expr(
            "transform(sequence(1, (size(ws) + 7) div 8), " +
              "i -> array_join(slice(ws, (i - 1) * 8 + 1, 8), ' '))"))
            .as(Seq("ln", "line")))
        .withColumn("lh", md5(col("line")))
        .groupBy("lh", "b")
        .agg(min(col("doc_id")).as("rep"), min(col("line")).as("line"))
        .withColumn("ts", timestamp_micros(
          lit(1700000000000000L) + col("b") * 3600L * 1000000L))
        .persist()
      try {
        val tmp = java.nio.file.Files.createTempDirectory("graft_d17").toString
        deleteOnExit(tmp)
        val (src, out, ckpt) = (s"$tmp/src", s"$tmp/out", s"$tmp/ckpt")
        pre.filter(col("b") === 0).coalesce(1).write.parquet(src)
        val s2 = s.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", StreamShufflePartitions)
        val q = s2.readStream.schema(pre.schema).parquet(src)
          .withWatermark("ts", "1 day")
          .dropDuplicatesWithinWatermark("lh")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).start()
        try {
          q.processAllAvailable()
          (1L to 2L).foreach { b =>
            pre.filter(col("b") === b).coalesce(1)
              .write.mode("append").parquet(src)
            q.processAllAvailable()
          }
        } finally q.stop()
        val nb = pre.groupBy("lh").agg(count(lit(1)).as("n_batches"))
        s.read.parquet(out)
          .join(nb, "lh")
          .groupBy(col("b").as("batch"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("rep")).as("sum_doc_id"),
            sum(length(col("line")).cast("long")).as("sum_chars_kept"),
            sum(col("n_batches") - 1).as("n_dup_batches_dropped"))
          .orderBy("batch")
      } finally { pre.unpersist(false); () }
    },
    Some("""WITH w AS (
        SELECT doc_id, doc_id % 3 AS b, string_split(text, ' ') AS ws
        FROM documents),
      l AS (
        SELECT doc_id, b, i.i AS ln,
          array_to_string(ws[(i.i - 1) * 8 + 1:i.i * 8], ' ') AS line
        FROM w, LATERAL unnest(generate_series(1, (len(ws) + 7) // 8)) AS i(i)),
      pre AS (
        SELECT md5(line) AS lh, b, MIN(doc_id) AS rep, MIN(line) AS line
        FROM l GROUP BY 1, 2),
      nb AS (SELECT lh, COUNT(*) AS n_batches FROM pre GROUP BY 1),
      first AS (SELECT lh, MIN(b) AS b FROM pre GROUP BY 1),
      kept AS (
        SELECT p.lh, p.b, p.rep, p.line FROM pre p
        JOIN first f ON f.lh = p.lh AND f.b = p.b)
      SELECT k.b AS batch, COUNT(*) AS n_kept,
        CAST(SUM(k.rep) AS BIGINT) AS sum_doc_id,
        CAST(SUM(len(k.line)) AS BIGINT) AS sum_chars_kept,
        CAST(SUM(n.n_batches - 1) AS BIGINT) AS n_dup_batches_dropped
      FROM kept k JOIN nb n ON n.lh = k.lh
      GROUP BY 1 ORDER BY 1"""))

  /** W9: STREAMING session windows — w2's gap sessionization as a stateful
    * Structured Streaming aggregation via the built-in `session_window`
    * (gap = 30 min, the w2 constant): events arrive as three time-tercile
    * file drops, open sessions MERGE in state across micro-batch
    * boundaries (the part a tumbling window can't express), and Append
    * mode emits each session exactly once when the watermark passes its
    * close. A far-future sentinel rides a 4th drop to push the watermark
    * past every real session (its own session never finalizes, so it
    * needs no filter — but one is kept for defense). The oracle is the
    * batch gap-split with `session_window`'s exact boundary rule: a new
    * session starts at gap >= 30 min (windows are half-open [t, t+gap),
    * so an exactly-30-min gap separates) — deliberately NOT w2's > rule;
    * the two entries pin both boundary semantics. Per-user rollup of the
    * emitted sessions runs batch-side on the read-back. */
  /** The w9 event slice: (user_id, event_id, epoch-µs). */
  private[graft] def w9Events(s: SparkSession, dir: String): DataFrame =
    graft.Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))

  /** The w9 drop boundaries: tercile points nudged FORWARD to the first
    * in-session adjacent pair (same user, gap < 30 min) at or after each
    * point, so at least one open session straddles each drop boundary and
    * the cross-batch session MERGE is actually exercised (a plain tercile
    * cut can fall in a corpus-wide quiet gap — it did at sf0.001).
    * Falls back to the plain tercile when no pair lands in the third.
    * The streamed RESULT is batching-invariant; only the exercised state
    * path depends on the cuts. Both aggs are dimension-sized. */
  private[graft] def w9Cuts(ev: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.expressions.Window
    val mm = ev.agg(min(col("us")), max(col("us"))).head()
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val (t1, t2) = (mn + (mx - mn) / 3, mn + 2 * (mx - mn) / 3)
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
    val pairs = ev.withColumn("nxt", lead(col("us"), 1).over(w))
      .filter(col("nxt").isNotNull &&
        col("nxt") - col("us") < 1800000000L && col("nxt") < mx)
      .select(col("us")).persist()
    def cutAtOrAfter(t: Long, below: Long): Option[Long] =
      pairs.filter(col("us") >= t && col("us") < below)
        .agg(min(col("us"))).head() match {
          case r if r.isNullAt(0) => None
          case r => Some(r.getLong(0))
        }
    try {
      val c1 = cutAtOrAfter(t1, t2).getOrElse(t1)
      val c2 = cutAtOrAfter(math.max(t2, c1 + 1), mx).getOrElse(t2)
      (c1, math.max(c2, c1 + 1))
    } finally { pairs.unpersist(false); () }
  }

  private val w9StreamSession = QueryDef(
    "w9_stream_session",
    (s, dir) => {
      // four consumers (max agg, the two cut searches, the batched drops)
      // otherwise re-derive the event slice from the source per pass
      val ev = w9Events(s, dir).persist()
      val mx = ev.agg(max(col("us"))).head().getLong(0)
      val (cut1, cut2) = w9Cuts(ev)
      // time-ordered drops: the watermark only ever advances, so no
      // event is late — the entry verifies session MERGE across batches,
      // not late-drop policy (r4_late_data owns that)
      val batched = ev.withColumn("batch",
        when(col("us") <= cut1, 0L).when(col("us") <= cut2, 1L).otherwise(2L))
      val sentinel = s.range(1).select(lit(-1L).as("user_id"),
        lit(-1L).as("event_id"),
        lit(mx + 10L * 86400L * 1000000L).as("us"), lit(3L).as("batch"))
      val folded = driveFold(s, batched.unionByName(sentinel), 4, "w9s") {
        (s2, stream) =>
        stream
          .withColumn("tsx", timestamp_micros(col("us")))
          .withWatermark("tsx", "1 minute")
          .groupBy(col("user_id"),
            session_window(col("tsx"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("sn"))
          .select(col("user_id"), col("sn"))
      }
      ev.unpersist(false)
      folded
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), max(col("sn")).as("max_session_n"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, COUNT(*) AS n_sessions, MAX(sn) AS max_session_n
      FROM (SELECT user_id, session_id, COUNT(*) AS sn
            FROM (SELECT user_id, SUM(is_new) OVER (
                    PARTITION BY user_id ORDER BY us ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                  FROM (SELECT user_id, event_id, epoch_us(ts) AS us,
                          CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
                            PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
                            >= 1800000000 THEN 1 ELSE 0 END AS is_new
                        FROM events))
            GROUP BY 1, 2)
      GROUP BY 1 ORDER BY 1"""))
}
