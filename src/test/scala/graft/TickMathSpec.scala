package graft

import graft.functions.TickMath
import org.apache.spark.sql.functions._

/** Exact Uniswap V3 tick-math kernel (uniswap_v3_math/{tick_math,
  * tick_bitmap,bit_math}.rs): boundary constants, golden vectors,
  * round-trip inverse over the full tick range, and the word-bitmap walk
  * against a naive sorted-set reference. */
class TickMathSpec extends SparkTestBase {
  import TickMath._

  test("boundary constants match the published Uniswap values") {
    assert(getSqrtRatioAtTick(MinTick) == MinSqrtRatio)
    assert(getSqrtRatioAtTick(MaxTick) == MaxSqrtRatio)
    assert(getSqrtRatioAtTick(0) == (BigInt(1) << 96))
  }

  test("golden vectors across the bit chain and the inversion") {
    val golden = Seq(
      1 -> "79232123823359799118286999568",
      -1 -> "79224201403219477170569942574",
      2 -> "79236085330515764027303304732",
      -2 -> "79220240490215316061937756561",
      10 -> "79267784519130042428790663799",
      -10 -> "79188560314459151373725315960",
      100 -> "79625275426524748796330556128",
      -100 -> "78833030112140176575862854579",
      400000 -> "38400329974042030913961448288742562464",
      -400000 -> "163464786360687385626",
      887271 -> "1461373636630004318706518188784493106690254656249")
    golden.foreach { case (t, r) =>
      assert(getSqrtRatioAtTick(t) == BigInt(r), s"tick $t")
    }
  }

  test("tick_at_sqrt_ratio round-trips every 997th tick plus boundaries") {
    val ticks = (MinTick to MaxTick by 997) ++
      Seq(MinTick, MaxTick - 1, -1, 0, 1, MaxDecimalTick, MaxDecimalTick + 1)
    ticks.foreach { t =>
      val r = getSqrtRatioAtTick(t)
      if (r < MaxSqrtRatio) {
        assert(getTickAtSqrtRatio(r) == t, s"round-trip at $t")
        // one below the tick's ratio belongs to the previous tick
        if (t > MinTick) assert(getTickAtSqrtRatio(r - 1) == t - 1, s"below at $t")
      }
    }
  }

  test("ratio is strictly monotone in tick") {
    val ticks = (MinTick to MaxTick by 9973) :+ MaxTick
    ticks.sliding(2).foreach { case Seq(a, b) =>
      assert(getSqrtRatioAtTick(a) < getSqrtRatioAtTick(b))
    }
  }

  private def naiveNext(init: Set[Int], tick: Int, spacing: Int,
      lte: Boolean): (Int, Boolean) = {
    // reference semantics restated: search only within the probe's word
    val compressed =
      if (tick < 0 && tick % spacing != 0) tick / spacing - 1 else tick / spacing
    if (lte) {
      val (w, b) = position(compressed)
      val cands = (0 to b).map(bit => (w << 8) + bit)
        .filter(c => init.contains(c * spacing))
      if (cands.nonEmpty) (cands.max * spacing, true)
      else (((w << 8) + 0) * spacing, false)
    } else {
      val (w, b) = position(compressed + 1)
      val cands = (b to 255).map(bit => (w << 8) + bit)
        .filter(c => init.contains(c * spacing))
      if (cands.nonEmpty) (cands.min * spacing, true)
      else (((w << 8) + 255) * spacing, false)
    }
  }

  test("bitmap walk matches naive reference on the tick_bitmap.rs vectors") {
    for (spacing <- Seq(1, 10, 60)) {
      val ticks = Seq(-200, -55, -4, 70, 78, 84, 139, 240, 535).map(_ * spacing)
      val bm = ticks.foldLeft(Map.empty[Int, BigInt])(flipTick(_, _, spacing))
      val init = ticks.toSet
      for (probe <- -260 * spacing to 560 * spacing by math.max(1, spacing / 2);
           lte <- Seq(true, false)) {
        val got = nextInitializedTickWithinOneWord(bm, probe, spacing, lte)
        val want = naiveNext(init, probe, spacing, lte)
        assert(got == want, s"spacing=$spacing probe=$probe lte=$lte")
      }
    }
  }

  test("double flip clears the bit") {
    val bm = flipTick(flipTick(Map.empty, -55, 1), -55, 1)
    assert(bm.values.forall(_ == 0))
  }

  test("expressions compute the exact ratio and inverse, codegen'd") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(!functions.SqrtRatioAtTick(Literal(0)).isInstanceOf[CodegenFallback])
    assert(!functions.TickAtSqrtRatio(Literal(0)).isInstanceOf[CodegenFallback])
    val s = spark
    import s.implicits._
    val ticks = Seq(MinTick, -400000, -100, -1, 0, 1, 100, 400000, MaxDecimalTick,
      MaxDecimalTick + 1, 887000)
    val rows = ticks.toDF("tick")
      .withColumn("ratio", sqrt_ratio_at_tick(col("tick")))
      .withColumn("back", tick_at_sqrt_ratio(col("ratio")))
      .collect()
    rows.foreach { r =>
      val t = r.getInt(0)
      if (t > MaxDecimalTick) assert(r.isNullAt(1), s"tick $t should be null")
      else {
        assert(BigInt(r.getDecimal(1).toBigInteger) == getSqrtRatioAtTick(t), s"tick $t")
        assert(r.getInt(2) == t, s"inverse at $t")
      }
    }
  }

  test("ratio → double is correctly rounded (golden bit patterns)") {
    // float(Fraction(ratio, 2^96)) in Python — true round-to-nearest-even
    // of the exact rational; BigInteger.doubleValue / 2^96 must land on the
    // same bits (and the oracle's VARCHAR→DOUBLE parse does too)
    val golden = Seq(
      -100 -> "0x1.fd724eeb1ea86p-1", -10 -> "0x1.ffbe7bd0e4c31p-1",
      -1 -> "0x1.fff972677adf6p-1", 0 -> "0x1.0p0",
      1 -> "0x1.000346d6ff116p0", 10 -> "0x1.0020c649300bep0",
      100 -> "0x1.01487bee1c17ep0", 10000 -> "0x1.a60fe569cab6cp0",
      -10000 -> "0x1.368d2c8b62fc8p-1")
    golden.foreach { case (t, hex) =>
      assert(sqrtPxAtTick(t) == java.lang.Double.parseDouble(hex), s"tick $t")
      assert(sqrtPxBand(t.toLong) == sqrtPxAtTick(t), s"band $t")
    }
    // band memo agrees with the direct path outside the memo range too
    Seq(-600L, 600L).foreach(t => assert(sqrtPxBand(t) == sqrtPxAtTick(t.toInt)))
  }

  test("tick_at_rate expression: exact ticks, codegen'd, null off-band") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(!functions.TickAtRate(Literal(1.0)).isInstanceOf[CodegenFallback])
    val s = spark
    import s.implicits._
    val rates = Seq(1.0035, 1.0010, 1.0, 0.5, 2.0, 1e-8, 1e8,
      0.0, -3.0, 1e-40, 1.8446744073709552e19, 1e40)
    val rows = rates.toDF("rate")
      .withColumn("tick", tick_at_rate(col("rate"))).collect()
    rows.zip(rates).foreach { case (r, rate) =>
      val exp = tickAtRateOrNull(rate)
      if (exp == null) assert(r.isNullAt(1), s"rate $rate should be null")
      else assert(r.getInt(1) == exp.intValue, s"rate $rate")
    }
    // the planted streaming-scenario coordinates, exact
    assert(tickAtRateOrNull(1.0035).intValue == 34)
    assert(tickAtRateOrNull(1.0010).intValue == 9)
    // non-positive / overflow-band rates are null on both engines
    Seq(0.0, -3.0, 1e-40, 1.8446744073709552e19, 1e40, Double.NaN)
      .foreach(r => assert(tickAtRateOrNull(r) == null, s"rate $r"))
  }

  test("rate → tick portability path") {
    assert(tickAtRate(1.0) == 0)
    // monotone over a wide grid; each tick consistent with the exact inverse
    val rates = Seq(1e-8, 1e-4, 0.5, 0.9999, 1.0, 1.0002, 2.0, 1e4, 1e8)
    val ts = rates.map(tickAtRate)
    assert(ts == ts.sorted)
    rates.foreach { px =>
      val x = sqrtRatioX96FromRate(px)
      val t = tickAtRate(px)
      assert(getSqrtRatioAtTick(t) <= x, s"rate $px")
      assert(getSqrtRatioAtTick(t + 1) > x, s"rate $px")
    }
  }
}
