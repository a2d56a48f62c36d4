# Prototype the DuckDB UHUGEINT limb-arithmetic oracle for
# get_sqrt_ratio_at_tick and validate it against the Python ground truth.
import duckdb
from tickmath_proto import get_sqrt_ratio_at_tick, CONSTS

P64  = 1 << 64
P96  = 1 << 96
P127 = 1 << 127
P128_1 = (1 << 128) - 1

consts_rows = ",".join(
    f"({i}, CAST('{CONSTS[i]}' AS UHUGEINT))" for i in range(20))

# mulshift128(r, c) with 64-bit limbs, all intermediates < 2^128:
#   rh=r//2^64, rl=r%2^64, ch=c//2^64, cl=c%2^64
#   u = rh*cl + (rl*cl)//2^64 ; v = rl*ch + u%2^64
#   res = rh*ch + u//2^64 + v//2^64
MULSHIFT = """
  ((r.ratio // CAST('18446744073709551616' AS UHUGEINT)) * (k.c // CAST('18446744073709551616' AS UHUGEINT))
   + ((r.ratio // CAST('18446744073709551616' AS UHUGEINT)) * (k.c % CAST('18446744073709551616' AS UHUGEINT))
      + ((r.ratio % CAST('18446744073709551616' AS UHUGEINT)) * (k.c % CAST('18446744073709551616' AS UHUGEINT))) // CAST('18446744073709551616' AS UHUGEINT)
     ) // CAST('18446744073709551616' AS UHUGEINT)
   + ((r.ratio % CAST('18446744073709551616' AS UHUGEINT)) * (k.c // CAST('18446744073709551616' AS UHUGEINT))
      + ((r.ratio // CAST('18446744073709551616' AS UHUGEINT)) * (k.c % CAST('18446744073709551616' AS UHUGEINT))
         + ((r.ratio % CAST('18446744073709551616' AS UHUGEINT)) * (k.c % CAST('18446744073709551616' AS UHUGEINT))) // CAST('18446744073709551616' AS UHUGEINT)
        ) % CAST('18446744073709551616' AS UHUGEINT)
     ) // CAST('18446744073709551616' AS UHUGEINT))
"""

SQL = f"""
WITH RECURSIVE tmconst(bit, c) AS (VALUES {consts_rows}),
ticks(tick) AS (SELECT * FROM tin),
tmchain(tick, nb, ratio, started) AS (
  SELECT tick, 0, CAST(0 AS UHUGEINT), FALSE FROM ticks WHERE tick <> 0
  UNION ALL
  SELECT r.tick, r.nb + 1,
    CASE WHEN (abs(r.tick) // CAST(POWER(2, r.nb) AS BIGINT)) % 2 = 1 THEN
      CASE WHEN r.started THEN {MULSHIFT} ELSE k.c END
    ELSE r.ratio END,
    r.started OR ((abs(r.tick) // CAST(POWER(2, r.nb) AS BIGINT)) % 2 = 1)
  FROM tmchain r JOIN tmconst k ON k.bit = r.nb
  WHERE r.nb <= 19),
tmneg(tick, ratio) AS (
  SELECT tick, ratio FROM tmchain WHERE nb = 20),
-- binary long division q = floor((2^256-1)/ratio) for positive ticks,
-- 256 MSB-first steps; every numerator bit is 1. subtract iff rem >= r//2.
tmdiv(tick, i, r, rem, qh, ql) AS (
  SELECT tick, 0, ratio, CAST(0 AS UHUGEINT), CAST(0 AS UHUGEINT), CAST(0 AS UHUGEINT)
  FROM tmneg WHERE tick > 0
  UNION ALL
  SELECT tick, i + 1, r,
    CASE WHEN rem >= r // CAST(2 AS UHUGEINT)
      THEN (rem - r // CAST(2 AS UHUGEINT)) * CAST(2 AS UHUGEINT) + (CAST(1 AS UHUGEINT) - r % CAST(2 AS UHUGEINT))
      ELSE rem * CAST(2 AS UHUGEINT) + CAST(1 AS UHUGEINT) END,
    qh * CAST(2 AS UHUGEINT) + ql // CAST('170141183460469231731687303715884105728' AS UHUGEINT),
    (ql % CAST('170141183460469231731687303715884105728' AS UHUGEINT)) * CAST(2 AS UHUGEINT)
      + CASE WHEN rem >= r // CAST(2 AS UHUGEINT) THEN CAST(1 AS UHUGEINT) ELSE CAST(0 AS UHUGEINT) END
  FROM tmdiv WHERE i < 256),
tmpre(tick, ratio, qh, ql) AS (
  SELECT tick, CAST(NULL AS UHUGEINT), qh, ql FROM tmdiv WHERE i = 256
  UNION ALL SELECT tick, ratio, NULL, NULL FROM tmneg WHERE tick < 0),
sqrtp(tick, ratio_x96) AS (
  SELECT tick,
    CASE WHEN tick < 0 THEN
      ratio // CAST('4294967296' AS UHUGEINT)
        + CASE WHEN ratio % CAST('4294967296' AS UHUGEINT) = 0 THEN CAST(0 AS UHUGEINT) ELSE CAST(1 AS UHUGEINT) END
    ELSE
      qh * CAST('79228162514264337593543950336' AS UHUGEINT)
        + ql // CAST('4294967296' AS UHUGEINT)
        + CASE WHEN ql % CAST('4294967296' AS UHUGEINT) = 0 THEN CAST(0 AS UHUGEINT) ELSE CAST(1 AS UHUGEINT) END
    END
  FROM tmpre
  UNION ALL
  SELECT tick, CAST('79228162514264337593543950336' AS UHUGEINT)
  FROM ticks WHERE tick = 0)
SELECT tick, CAST(ratio_x96 AS VARCHAR) AS r FROM sqrtp ORDER BY tick
"""

con = duckdb.connect()
ticks = list(range(-887272, 400001, 1009)) + [-887272, 400000, 0, 1, -1, 2, -2]
ticks = sorted(set(ticks))
con.execute("CREATE TABLE tin(tick BIGINT)")
con.executemany("INSERT INTO tin VALUES (?)", [(t,) for t in ticks])
rows = con.execute(SQL).fetchall()
assert len(rows) == len(ticks), (len(rows), len(ticks))
bad = 0
for t, r in rows:
    exp = get_sqrt_ratio_at_tick(t)
    if int(r) != exp:
        bad += 1
        if bad < 5: print("MISMATCH", t, r, exp)
print("checked", len(rows), "ticks, mismatches =", bad)
