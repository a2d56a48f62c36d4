package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent, engine-portable aggregation over doubles.
  *
  * Summing IEEE doubles is order-dependent; Spark's partial aggregation
  * order differs run-to-run and from any single-threaded oracle, so raw
  * `sum(double)` can never hash-match an external engine. The fix: cast each
  * addend to an exact DECIMAL(38,s) (deterministic round-to-nearest), sum in
  * decimal (exact, associative, commutative → order-independent), cast the
  * final total back to DOUBLE (deterministic). Both Spark and DuckDB produce
  * bit-identical results for the same rows, at any parallelism — this is
  * what makes every aggregate in this library reproducible on a
  * 1000-executor cluster, not just on one thread.
  *
  * Per-row arithmetic (multiply, divide, exp) stays in DOUBLE — IEEE ops are
  * deterministic per element; only the *reduction* needs the decimal detour.
  * DECIMAL(38,6) holds ±1e31, far beyond any sum of test or cluster data.
  *
  * Oracle-side equivalent: `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
  */
object ExactAgg {
  val Scale = 6

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = Scale): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  /** Partial-aggregation form of [[dsum]]: the scale-6 decimal sum WITHOUT
    * the final double cast, for two-stage rollups whose outer stage sums
    * the decimal partials and casts once — bit-identical to a single-stage
    * [[dsum]] because decimal addition is exact and associative (the
    * intermediate never round-trips through a double). */
  def dsumPartial(c: Column, scale: Int = Scale): Column =
    sum(c.cast(DecimalType(38, scale)))

  /** DRIVER-side replica of [[dsum]], bit-for-bit: each addend →
    * shortest-repr BigDecimal at scale-6 half-up (Spark's
    * double→DECIMAL(38,6) cast), exact decimal accumulation,
    * string→double for the correctly-rounded total. For the sanctioned
    * driver-local folds (g4 rundown, stream staging) whose results must
    * still hash against the DuckDB oracle's sqlSum. */
  def dsumDriver(xs: Iterable[Double], scale: Int = Scale): Double = {
    val tot = xs.foldLeft(java.math.BigDecimal.ZERO) { (acc, x) =>
      acc.add(java.math.BigDecimal.valueOf(x)
        .setScale(scale, java.math.RoundingMode.HALF_UP))
    }
    java.lang.Double.parseDouble(tot.toPlainString)
  }

  /** Exact mean (decimal-sum / row count), as double. The denominator is
    * COUNT(*) — matching the sqlAvg oracle fragment — not COUNT(col), so the
    * two engines agree even when the column contains NULLs. */
  def davg(c: Column, scale: Int = Scale): Column =
    dsum(c, scale) / count(lit(1))

  /** Population stddev from exact sums: sqrt(E[x^2] - E[x]^2).
    * Built-in stddev_pop accumulates in floating point (order-dependent);
    * this variant is reproducible across engines and parallelism.
    * COUNT(*) denominator, mirroring sqlStddevPop. The mean is squared by
    * MULTIPLICATION, not pow(): IEEE *, /, sqrt are correctly rounded in
    * every engine, while libm pow may differ by 1 ulp between JVM and C.
    */
  def dstddevPop(c: Column, scale: Int = Scale): Column = {
    val mean = dsum(c, scale) / count(lit(1))
    sqrt(dsum(c * c, scale) / count(lit(1)) - mean * mean)
  }

  /** Snap a DERIVED double (a ratio, or a product chain containing one) to
    * the 1e-scale grid using only correctly-rounded IEEE ops (*, +, floor,
    * /), so both engines compute the IDENTICAL double. `round()` cannot do
    * this job cross-engine: Spark rounds the shortest decimal repr while
    * DuckDB rounds the true binary value, so a ratio landing on a .5e-6
    * boundary rounds differently — exactly the r2 hash-failure mode. The
    * snapped value sits within ~1e-16·|x| of its grid point, ~0.5e-6 away
    * from any cast boundary, so the later double→DECIMAL cast in [[dsum]]
    * agrees bit-for-bit. Valid for |x| < 1e9 (representation error stays
    * below the half-grid distance) — far above any ratio in this domain. */
  def snap(c: Column, scale: Int = Scale): Column = {
    val p = math.pow(10.0, scale)
    floor(c * p + lit(0.5)) / p
  }

  /** [[dsum]] for derived-double addends: grid-snap, then exact-sum. Use
    * whenever the addend is computed (out/in, pv/v, delta·px) rather than a
    * grid-aligned data column. */
  def dsumR(c: Column, scale: Int = Scale): Column = dsum(snap(c, scale), scale)

  /** Oracle SQL fragment mirroring [[snap]]. */
  def sqlSnap(expr: String, scale: Int = Scale): String =
    s"(FLOOR(($expr) * 1e$scale + 0.5) / 1e$scale)"

  /** Oracle SQL fragment mirroring [[dsumR]]. */
  def sqlSumR(expr: String, scale: Int = Scale): String =
    sqlSum(sqlSnap(expr, scale), scale)

  /** Oracle SQL fragment mirroring [[dsum]]. The decimal total converts to
    * DOUBLE through VARCHAR: DuckDB's direct DECIMAL→DOUBLE cast divides by
    * 10^scale in floating point and can be 1 ulp off the correctly-rounded
    * value, while its string→double parse (like Spark's decimal cast) is
    * correctly rounded — so this is what makes the two engines bit-equal. */
  def sqlSum(expr: String, scale: Int = Scale): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(38,$scale))) AS VARCHAR) AS DOUBLE)"

  def sqlAvg(expr: String, scale: Int = Scale): String =
    s"(${sqlSum(expr, scale)} / COUNT(*))"

  def sqlStddevPop(expr: String, scale: Int = Scale): String =
    s"SQRT(${sqlSum(s"($expr)*($expr)", scale)} / COUNT(*) - " +
      s"(${sqlSum(expr, scale)} / COUNT(*)) * (${sqlSum(expr, scale)} / COUNT(*)))"
}
