package graft.queries

/** DuckDB-side restatement of the exact Q64.96 tick math
  * (`uniswap_v3_math/tick_math.rs` — the published Uniswap v3-core
  * algorithm) as recursive-CTE integer arithmetic, so the oracle derives
  * every √price ratio from the public constants independently of the Spark
  * kernel in [[graft.functions.TickMath]] (no side copies the other's
  * output; `tools/tickmath_duck.py` validates the two bit-identical over
  * 1282 ticks spanning the full range).
  *
  * DuckDB has no 256-bit type, so the u256 steps decompose into UHUGEINT
  * (u128) limb arithmetic: the product chain's `(ratio * c) >> 128` runs as
  * four 64-bit limb products, and the positive-tick `⌊(2^256−1)/ratio⌋`
  * runs as 256-step MSB-first binary long division with a two-limb
  * quotient. ratio→DOUBLE goes through VARCHAR: DuckDB's direct
  * UHUGEINT→DOUBLE cast is NOT correctly rounded (off by one ulp on ~1% of
  * ticks), its VARCHAR→DOUBLE parse is — and matches the JVM's
  * correctly-rounded BigInteger→double.
  *
  * Queries splice these fragments after their domain CTEs; the final SQL
  * must begin `WITH RECURSIVE`.
  */
object TickSql {

  private val Consts = Seq(
    "fffcb933bd6fad37aa2d162d1a594001", "fff97272373d413259a46990580e213a",
    "fff2e50f5f656932ef12357cf3c7fdcc", "ffe5caca7e10e4e61c3624eaa0941cd0",
    "ffcb9843d60f6159c9db58835c926644", "ff973b41fa98c081472e6896dfb254c0",
    "ff2ea16466c96a3843ec78b326b52861", "fe5dee046a99a2a811c461f1969c3053",
    "fcbe86c7900a88aedcffc83b479aa3a4", "f987a7253ac413176f2b074cf7815e54",
    "f3392b0822b70005940c7a398e4b70f3", "e7159475a2c29b7443b29c7fa6e889d9",
    "d097f3bdfd2022b8845ad8f792aa5825", "a9f746462d870fdf8a65dc1f90e061e5",
    "70d869a156d2a1b890bb3df62baf32f7", "31be135f97d08fd981231505542fcfa6",
    "9aa508b5b7a84e1c677de54f3e99bc9", "5d6af8dedb81196699c329225ee604",
    "2216e584f5fa1ea926041bedfe98", "48a170391f7dc42444e8fa2")
    .map(h => BigInt(h, 16).toString)

  private def u(v: String) = s"CAST('$v' AS UHUGEINT)"
  private val P64 = u("18446744073709551616")   // 2^64
  private val P127 = u("170141183460469231731687303715884105728") // 2^127
  private val P96 = u("79228162514264337593543950336")            // 2^96
  private val P32 = u("4294967296")             // 2^32
  /** 2^96 as an exact double literal (power of two → exact parse). */
  val P96d = "79228162514264337593543950336.0e0"
  val MinSqrtRatio = "4295128739"

  /** `(a * c) >> 128` with both operands < 2^128, via 64-bit limbs; every
    * intermediate stays below 2^128. */
  private def mulShift128(a: String, c: String): String = {
    val (ah, al) = (s"($a // $P64)", s"($a % $P64)")
    val (ch, cl) = (s"($c // $P64)", s"($c % $P64)")
    val hi = s"($ah * $cl + ($al * $cl) // $P64)"
    s"""($ah * $ch + $hi // $P64
       |     + ($al * $ch + $hi % $P64) // $P64)""".stripMargin
  }

  /** CTE fragment: exact √1.0001^tick in Q64.96 for every tick produced by
    * `tickSrc` (a SELECT with one column `tick`, DISTINCT values within
    * [MinTick, MaxTick]; must NOT be a top-level UNION — under WITH
    * RECURSIVE DuckDB gives any top-level-UNION CTE body anchor/step
    * treatment even without self-reference and duplicates rows; wrap in
    * SELECT DISTINCT ... FROM (...) instead). Emits CTEs prefixed `$p`;
    * the last, `${p}px(tick, ratio_x96, px)`, carries the ratio and its
    * correctly rounded double / 2^96. Requires WITH RECURSIVE at the
    * query head. */
  def ratioCtes(p: String, tickSrc: String): String = {
    val constRows = Consts.zipWithIndex
      .map { case (c, i) => s"($i, ${u(c)})" }.mkString(", ")
    s"""${p}c(bit, c) AS (VALUES $constRows),
       |  ${p}t(tick) AS ($tickSrc),
       |  ${p}ch(tick, nb, ratio, started) AS (
       |    SELECT tick, 0, CAST(0 AS UHUGEINT), FALSE FROM ${p}t WHERE tick <> 0
       |    UNION ALL
       |    SELECT r.tick, r.nb + 1,
       |      CASE WHEN (abs(r.tick) // CAST(POWER(2, r.nb) AS BIGINT)) % 2 = 1 THEN
       |        CASE WHEN r.started THEN ${mulShift128("r.ratio", "k.c")} ELSE k.c END
       |      ELSE r.ratio END,
       |      r.started OR ((abs(r.tick) // CAST(POWER(2, r.nb) AS BIGINT)) % 2 = 1)
       |    FROM ${p}ch r JOIN ${p}c k ON k.bit = r.nb
       |    WHERE r.nb <= 19),
       |  ${p}neg(tick, ratio) AS (
       |    SELECT tick, ratio FROM ${p}ch WHERE nb = 20),
       |  ${p}dv(tick, i, r, rem, qh, ql) AS (
       |    SELECT tick, 0, ratio, CAST(0 AS UHUGEINT), CAST(0 AS UHUGEINT),
       |      CAST(0 AS UHUGEINT)
       |    FROM ${p}neg WHERE tick > 0
       |    UNION ALL
       |    SELECT tick, i + 1, r,
       |      CASE WHEN rem >= r // CAST(2 AS UHUGEINT)
       |        THEN (rem - r // CAST(2 AS UHUGEINT)) * CAST(2 AS UHUGEINT)
       |          + (CAST(1 AS UHUGEINT) - r % CAST(2 AS UHUGEINT))
       |        ELSE rem * CAST(2 AS UHUGEINT) + CAST(1 AS UHUGEINT) END,
       |      qh * CAST(2 AS UHUGEINT) + ql // $P127,
       |      (ql % $P127) * CAST(2 AS UHUGEINT)
       |        + CASE WHEN rem >= r // CAST(2 AS UHUGEINT)
       |            THEN CAST(1 AS UHUGEINT) ELSE CAST(0 AS UHUGEINT) END
       |    FROM ${p}dv WHERE i < 256),
       |  ${p}pre(tick, ratio, qh, ql) AS (
       |    SELECT tick, CAST(NULL AS UHUGEINT), qh, ql FROM ${p}dv WHERE i = 256
       |    UNION ALL SELECT tick, ratio, NULL, NULL FROM ${p}neg WHERE tick < 0),
       |  ${p}sq(tick, ratio_x96) AS (
       |    SELECT tick,
       |      CASE WHEN tick < 0 THEN
       |        ratio // $P32
       |          + CASE WHEN ratio % $P32 = 0 THEN CAST(0 AS UHUGEINT)
       |                 ELSE CAST(1 AS UHUGEINT) END
       |      ELSE
       |        qh * $P96 + ql // $P32
       |          + CASE WHEN ql % $P32 = 0 THEN CAST(0 AS UHUGEINT)
       |                 ELSE CAST(1 AS UHUGEINT) END
       |      END
       |    FROM ${p}pre
       |    UNION ALL
       |    SELECT tick, $P96 FROM ${p}t WHERE tick = 0),
       |  ${p}px(tick, ratio_x96, px) AS (
       |    SELECT tick, ratio_x96,
       |      CAST(CAST(ratio_x96 AS VARCHAR) AS DOUBLE) / $P96d
       |    FROM ${p}sq)""".stripMargin
  }

  /** CTE fragment: the exact tick of each (keys, rate) row of `rateSrc`
    * (unique key tuples, column `rate` DOUBLE). Quantizes x =
    * ⌊√rate·2^96⌋ (each step exact / correctly rounded on both engines),
    * takes a libm log guess — only needed to land within ±2, any libm
    * qualifies — and selects MAX(tick) with exact ratio(tick) ≤ x from the
    * candidate band. Emits `${p}tick(keys..., tick)` with tick NULL when
    * rate is non-positive or x is outside the ratio range, mirroring the
    * Spark expression's null contract. */
  def tickAtRateCtes(p: String, rateSrc: String, keyCols: Seq[String]): String = {
    val keys = keyCols.mkString(", ")
    val sKeys = keyCols.map("s." + _).mkString(", ")
    s"""${p}g AS (
       |    SELECT $keys, rate,
       |      CASE WHEN rate > 0 AND rate < 18446744073709551616.0e0
       |        THEN CAST(FLOOR(SQRT(rate) * $P96d) AS UHUGEINT) END AS x,
       |      CASE WHEN rate > 0 AND rate < 18446744073709551616.0e0
       |        THEN CAST(ROUND(LN(rate) / LN(1.0001)) AS BIGINT) END AS g
       |    FROM ($rateSrc)),
       |  ${p}cd(tick) AS (
       |    -- 443636 = largest tick whose ratio fits UHUGEINT (< 2^128);
       |    -- the rate < 2^64 guard above already caps the true tick there
       |    SELECT DISTINCT g + d AS tick
       |    FROM ${p}g, (VALUES (-2), (-1), (0), (1), (2)) v(d)
       |    WHERE g IS NOT NULL AND g + d BETWEEN -887272 AND 443636),
       |  ${ratioCtes(p + "r", s"SELECT tick FROM ${p}cd")},
       |  ${p}tick AS (
       |    SELECT $sKeys, MAX(c.tick) AS tick
       |    FROM ${p}g s LEFT JOIN ${p}rpx c
       |      ON c.tick BETWEEN s.g - 2 AND s.g + 2
       |      AND c.ratio_x96 <= s.x
       |      AND s.x >= ${u(MinSqrtRatio)}
       |    GROUP BY $sKeys)""".stripMargin
  }
}
