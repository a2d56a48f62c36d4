package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, Decimal, IntegerType, LongType}

/** F10 (exact form): Uniswap V3 tick math as EXACT integer arithmetic —
  * the Q64.96 fixed-point kernel the reference implements in
  * `brontes-pricing/src/protocols/uniswap_v3/uniswap_v3_math/{tick_math,
  * tick_bitmap,bit_math}.rs` (itself the published Uniswap v3-core
  * algorithm). √1.0001^tick is computed as a 20-step binary product chain
  * over 128-bit fixed-point constants — pure integer multiply/shift, so
  * the result is bit-identical on every platform: no libm `pow`, no 1-ulp
  * JVM-vs-C divergence (the reason earlier rounds linearized √P).
  *
  * JVM realization: `java.math.BigInteger` (exact, deterministic). The
  * hot-path entry points are the codegen'd expressions below; the swap
  * walk's per-range boundary ratios are per-(pool,k) DIMENSION values, so
  * the BigInteger cost is amortized across the fact rows — the fact-side
  * math stays double (IEEE ops on exactly-cast integer inputs, portable).
  *
  * The driver oracle re-states the same chain independently in DuckDB
  * UHUGEINT limb arithmetic (see MiscOps.sqrtRatioCteSql), so Spark and
  * DuckDB each compute the ratios from the public constants — no side
  * copies the other's output.
  */
object TickMath {
  val MinTick: Int = -887272
  val MaxTick: Int = 887272
  /** Largest tick whose ratio fits DECIMAL(38,0) — the expression/oracle
    * band. [MinTick, MaxDecimalTick] covers every realistically priced
    * pool; the full positive range works in `getSqrtRatioAtTick` and is
    * exercised by TickMathSpec up to MaxTick. */
  val MaxDecimalTick: Int = 419143

  val MinSqrtRatio: BigInt = BigInt("4295128739")
  val MaxSqrtRatio: BigInt =
    BigInt("1461446703485210103287273052203988822378723970342")

  /** Bit-k multipliers: round(2^128 / 1.0001^(2^(k-1))) — tick_math.rs:32-95. */
  private val Consts: Array[BigInt] = Array(
    "fffcb933bd6fad37aa2d162d1a594001",
    "fff97272373d413259a46990580e213a",
    "fff2e50f5f656932ef12357cf3c7fdcc",
    "ffe5caca7e10e4e61c3624eaa0941cd0",
    "ffcb9843d60f6159c9db58835c926644",
    "ff973b41fa98c081472e6896dfb254c0",
    "ff2ea16466c96a3843ec78b326b52861",
    "fe5dee046a99a2a811c461f1969c3053",
    "fcbe86c7900a88aedcffc83b479aa3a4",
    "f987a7253ac413176f2b074cf7815e54",
    "f3392b0822b70005940c7a398e4b70f3",
    "e7159475a2c29b7443b29c7fa6e889d9",
    "d097f3bdfd2022b8845ad8f792aa5825",
    "a9f746462d870fdf8a65dc1f90e061e5",
    "70d869a156d2a1b890bb3df62baf32f7",
    "31be135f97d08fd981231505542fcfa6",
    "9aa508b5b7a84e1c677de54f3e99bc9",
    "5d6af8dedb81196699c329225ee604",
    "2216e584f5fa1ea926041bedfe98",
    "48a170391f7dc42444e8fa2").map(BigInt(_, 16))

  private val One = BigInt(1)
  private val U256Max = (One << 256) - 1
  private val P32 = One << 32
  private val P96: BigInt = One << 96
  /** 2^96 as an exactly-representable double (power of two). */
  val P96d: Double = math.scalb(1.0, 96)

  /** tick → √1.0001^tick in Q64.96 (tick_math.rs get_sqrt_ratio_at_tick:
    * product chain over the set bits of |tick|, inverted via
    * U256::MAX / ratio for positive ticks, >>32 rounding up). */
  def getSqrtRatioAtTick(tick: Int): BigInt = {
    require(tick >= MinTick && tick <= MaxTick, s"tick out of range: $tick")
    val a = math.abs(tick)
    var ratio = if ((a & 1) == 1) Consts(0) else One << 128
    var i = 1
    while (i < 20) {
      if ((a & (1 << i)) != 0) ratio = (ratio * Consts(i)) >> 128
      i += 1
    }
    if (tick > 0) ratio = U256Max / ratio
    (ratio >> 32) + (if ((ratio & (P32 - 1)) == 0) 0 else 1)
  }

  private val Sqrt10001 = BigInt("255738958999603826347141")
  private val TickLow = BigInt("3402992956809132418596140100660247210")
  private val TickHigh = BigInt("291339464771989622907027621153398088495")

  /** Q64.96 ratio → largest tick whose ratio ≤ x (tick_math.rs
    * get_tick_at_sqrt_ratio: normalize to [2^127,2^128), 14 squaring steps
    * extract the base-2 log fraction, rescale by log₂√1.0001, disambiguate
    * the ±1 candidate band via the forward function). */
  def getTickAtSqrtRatio(x: BigInt): Int = {
    require(x >= MinSqrtRatio && x < MaxSqrtRatio, s"ratio out of range: $x")
    val ratio = x << 32
    val msb = ratio.bitLength - 1
    var r = if (msb >= 128) ratio >> (msb - 127) else ratio << (127 - msb)
    var log2 = BigInt(msb - 128) << 64
    var i = 63
    while (i >= 50) {
      r = (r * r) >> 127
      val f = (r >> 128).toInt
      if (f == 1) { log2 = log2 | (One << i); r = r >> 1 }
      i -= 1
    }
    val ls = log2 * Sqrt10001
    val tickLow = ((ls - TickLow) >> 128).toInt
    val tickHigh = ((ls + TickHigh) >> 128).toInt
    if (tickLow == tickHigh) tickLow
    else if (getSqrtRatioAtTick(tickHigh) <= x) tickHigh
    else tickLow
  }

  /** Observed execution rate → Q64.96 sqrt ratio: ⌊√rate · 2^96⌋. IEEE
    * requires sqrt to be correctly rounded (unlike pow/log), and scaling
    * by a power of two is exact, so this double path is engine-portable:
    * DuckDB's FLOOR(SQRT(px) * 2^96) lands on the same integer. */
  def sqrtRatioX96FromRate(rate: Double): BigInt = {
    val d = math.floor(math.sqrt(rate) * P96d)
    new java.math.BigDecimal(d).toBigInteger
  }

  /** Rate → tick via the exact inverse; MinTick-1 sentinel never returned:
    * callers must pre-filter rates to the ratio range. */
  def tickAtRate(rate: Double): Int =
    getTickAtSqrtRatio(sqrtRatioX96FromRate(rate))

  /** Rate → tick, null for non-positive rates, quantized ratios below
    * MinSqrtRatio, or rates ≥ 2^64 (whose ratio exceeds the oracle's
    * UHUGEINT width; ticks above 443636 are unreachable under this guard,
    * so both engines share one valid band). */
  def tickAtRateOrNull(rate: Double): java.lang.Integer = {
    if (!(rate > 0) || rate >= 1.8446744073709552e19) return null
    val x = sqrtRatioX96FromRate(rate)
    if (x < MinSqrtRatio) null
    else java.lang.Integer.valueOf(getTickAtSqrtRatio(x))
  }

  /** Ratio as double. BigInteger→double is correctly rounded
    * (round-to-nearest-even), which matches DuckDB's VARCHAR→DOUBLE parse
    * of the same integer — NOT its direct UHUGEINT→DOUBLE cast, which is
    * off by one ulp on ~1% of ticks (measured 12/1290 over the full
    * range); the oracle therefore mediates ratio→double through VARCHAR. */
  def sqrtPxAtTick(tick: Int): Double =
    getSqrtRatioAtTick(tick).doubleValue / P96d

  /** Memoized [[sqrtPxAtTick]] over the fixture band — the streaming
    * fold's per-range boundaries hit a handful of small ticks per event,
    * so the BigInteger chain runs once per distinct band tick per JVM. */
  private val BandLo = -512
  private val BandHi = 512
  private lazy val bandPx: Array[Double] =
    Array.tabulate(BandHi - BandLo + 1)(i => sqrtPxAtTick(BandLo + i))
  def sqrtPxBand(t: Long): Double =
    if (t >= BandLo && t <= BandHi) bandPx((t - BandLo).toInt)
    else sqrtPxAtTick(t.toInt)

  // ── tick bitmap (tick_bitmap.rs + bit_math.rs) ──────────────────────────

  /** Word/bit coordinates of a compressed tick (tick_bitmap.rs position).
    * `tick >> 8` is the arithmetic shift and `tick & 255` matches the
    * reference's `(tick % 256) as u8` wrap for negatives. */
  def position(compressed: Int): (Int, Int) = (compressed >> 8, compressed & 255)

  /** Flip a tick's initialized bit (tick_bitmap.rs flip_tick). */
  def flipTick(bm: Map[Int, BigInt], tick: Int, spacing: Int): Map[Int, BigInt] = {
    require(tick % spacing == 0, s"tick $tick not on spacing $spacing")
    val (w, b) = position(tick / spacing)
    bm.updated(w, bm.getOrElse(w, BigInt(0)) ^ (One << b))
  }

  /** Next initialized tick within one 256-tick word, at-or-below (lte) or
    * strictly above (tick_bitmap.rs next_initialized_tick_within_one_word).
    * Returns (nextTick, initialized); uninitialized → the word boundary. */
  def nextInitializedTickWithinOneWord(
      bm: Map[Int, BigInt], tick: Int, spacing: Int,
      lte: Boolean): (Int, Boolean) = {
    val compressed =
      if (tick < 0 && tick % spacing != 0) tick / spacing - 1
      else tick / spacing
    if (lte) {
      val (w, b) = position(compressed)
      val mask = (One << b) - 1 + (One << b)
      val masked = bm.getOrElse(w, BigInt(0)) & mask
      val init = masked != 0
      val next =
        if (init) (compressed - (b - (masked.bitLength - 1))) * spacing
        else (compressed - b) * spacing
      (next, init)
    } else {
      val (w, b) = position(compressed + 1)
      val mask = U256Max ^ ((One << b) - 1)
      val masked = bm.getOrElse(w, BigInt(0)) & mask
      val init = masked != 0
      val next =
        if (init) (compressed + 1 + (masked.lowestSetBit - b)) * spacing
        else (compressed + 1 + (255 - b)) * spacing
      (next, init)
    }
  }

  // ── codegen entry points (static forwarders referenced from generated
  //    Java; boxed-null signals out-of-band input) ────────────────────────

  def sqrtRatioDecimal(tick: Int): Decimal =
    if (tick < MinTick || tick > MaxDecimalTick) null
    else Decimal(new java.math.BigDecimal(getSqrtRatioAtTick(tick).bigInteger), 38, 0)

  def tickAtRatioOrNull(d: Decimal): java.lang.Integer = {
    val x = BigInt(d.toJavaBigDecimal.toBigInteger)
    if (x < MinSqrtRatio || x >= MaxSqrtRatio) null
    else java.lang.Integer.valueOf(getTickAtSqrtRatio(x))
  }

  // ── Column surface ──────────────────────────────────────────────────────

  /** tick → exact Q64.96 √price ratio as DECIMAL(38,0); NULL outside
    * [MinTick, MaxDecimalTick]. */
  def sqrt_ratio_at_tick(tick: Column): Column =
    B.column(SqrtRatioAtTick(B.expression(tick)))

  /** DECIMAL(38,0) Q64.96 ratio → tick; NULL outside the ratio range. */
  def tick_at_sqrt_ratio(ratio: Column): Column =
    B.column(TickAtSqrtRatio(B.expression(ratio)))

  /** Observed execution rate (DOUBLE) → exact tick: ⌊√rate·2^96⌋ then the
    * integer inverse; NULL for non-positive rates or ratios out of range. */
  def tick_at_rate(rate: Column): Column =
    B.column(TickAtRate(B.expression(rate)))
}

/** Codegen'd tick → Q64.96 ratio. The BigInteger chain runs behind a
  * static call; for the swap-walk usage the input is a dimension-sized
  * tick column, so this never dominates a fact-side pipeline. */
case class SqrtRatioAtTick(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "sqrt_ratio_at_tick"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType || child.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires INT/BIGINT input, got ${child.dataType.catalogString}")

  private def asInt(input: Any): Int = input match {
    case i: Int => i
    case l: Long => if (l < Int.MinValue || l > Int.MaxValue) Int.MinValue else l.toInt
  }

  override def nullSafeEval(input: Any): Any = TickMath.sqrtRatioDecimal(asInt(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("dec")
      val cast = if (child.dataType == LongType) s"(int) $c" else c
      s"""
         |org.apache.spark.sql.types.Decimal $d =
         |  graft.functions.TickMath.sqrtRatioDecimal($cast);
         |if ($d == null) { ${ev.isNull} = true; } else { ${ev.value} = $d; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd rate → exact tick: the floor-√·2^96 quantization plus the
  * integer inverse in one step (tick_math.rs get_tick_at_sqrt_ratio over an
  * observed price). IEEE sqrt is correctly rounded and the 2^96 scale is
  * exact, so the quantized ratio — and therefore the tick — is engine-
  * portable; the oracle selects the same tick from a ±2 candidate band
  * around the libm log guess via exact forward ratios. */
case class TickAtRate(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.DoubleType
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "tick_at_rate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TickMath.tickAtRateOrNull(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("t")
      s"""
         |java.lang.Integer $r = graft.functions.TickMath.tickAtRateOrNull($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd Q64.96 ratio → tick (the exact inverse). */
case class TickAtSqrtRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "tick_at_sqrt_ratio"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DecimalType() => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DECIMAL input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TickMath.tickAtRatioOrNull(input.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("t")
      s"""
         |java.lang.Integer $r = graft.functions.TickMath.tickAtRatioOrNull($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
