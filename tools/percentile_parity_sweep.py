#!/usr/bin/env python3
"""Percentile parity sweep: Spark `percentile` vs DuckDB `quantile_cont`.

Answers the question behind the q105 round-5 red: WHICH percentile
call sites can diverge from the DuckDB oracle at the repo's 6-decimal
rounding convention?

Method: replicate Spark's Percentile.getPercentile exactly in Python
(QuantilesSpec pins graft's exactQuantiles bit-equal to Spark, and
this formula bit-equal to exactQuantiles by construction), then
compare against DuckDB across seeded random data in three regimes:

1. continuous doubles        -> expected: bit-identical (both engines
   use the same (hi-pos)*vLo + (pos-lo)*vHi weighted interpolation)
2. integer / 2dp-decimal     -> expected: safe; midpoints are
   multiples of 0.5 / 0.005, which cannot tie at the 6th decimal
3. integer microseconds / 1e6 (the q105 shape) -> expected: UNSAFE
   under round(x, 6): midpoints of 6dp values land exactly on the
   x.xxxxxx5 tie, where Spark rounds the shortest-decimal-string
   HALF_UP and DuckDB rounds in binary. This is why
   interArrivalStats aggregates integer microseconds and divides
   AFTER floor(x + 0.5).

Exit 0 iff regimes 1-2 show no 6dp divergence and regime 3
demonstrates at least one tie (confirming the guard is load-bearing).
"""
import math
import random
import sys

import duckdb


def spark_percentile(vals, p):
    s = sorted(vals)
    n = len(s)
    pos = p * (n - 1)
    lo, hi = math.floor(pos), math.ceil(pos)
    if lo == hi or s[int(lo)] == s[int(hi)]:
        return float(s[int(lo)])
    return (hi - pos) * s[int(lo)] + (pos - lo) * s[int(hi)]


def duck_quantile(con, vals, p):
    con.execute(
        "CREATE OR REPLACE TABLE t AS SELECT * FROM (SELECT unnest(?) AS v)",
        [vals])
    return con.execute("SELECT quantile_cont(v, ?) FROM t", [p]).fetchone()[0]


def sweep(con, gen, seeds, ps, label):
    raw = sixdp = total = 0
    for seed in range(seeds):
        random.seed(seed)
        vals = gen()
        for p in ps:
            total += 1
            sp = spark_percentile(vals, p)
            dk = duck_quantile(con, [float(v) for v in vals], p)
            if sp != dk:
                raw += 1
            if round(sp, 6) != round(dk, 6):
                sixdp += 1
    print(f"{label}: cases={total} bit_mismatch={raw} sixdp_mismatch={sixdp}")
    return raw, sixdp


def main():
    con = duckdb.connect()
    ps = (0.05, 0.5, 0.9, 0.95, 0.99)
    ok = True

    _, s1 = sweep(con, lambda: [random.uniform(-1e6, 1e6)
                                for _ in range(random.randint(5, 200))],
                  200, ps, "continuous doubles")
    ok &= s1 == 0

    _, s2 = sweep(con, lambda: [random.randint(0, 10_000) / 100.0
                                for _ in range(random.randint(5, 200))],
                  200, ps, "2dp decimals")
    ok &= s2 == 0

    _, s3 = sweep(con, lambda: [random.randint(0, 10**6)
                                for _ in range(random.randint(5, 200))],
                  200, ps, "integers")
    ok &= s3 == 0

    # regime 3: 6dp values (integer micros / 1e6). The TIE itself is
    # what matters: a midpoint landing exactly on x.xxxxxx5 is where
    # the two engines' round() disagree. Count the ties.
    ties = 0
    for seed in range(200):
        random.seed(seed)
        vals = [random.randint(0, 10**9) / 1e6
                for _ in range(random.randint(5, 200))]
        for p in ps:
            v = spark_percentile(vals, p)
            # exact tie at the 6th decimal <=> v*1e6's fraction is .5
            frac = abs(v) * 1e6 % 1
            if abs(frac - 0.5) < 1e-9:
                ties += 1
    print(f"micros/1e6: sixdp_tie_midpoints={ties} (each one is an "
          "engine-dependent round — the q105 class)")
    ok &= ties > 0

    print("PARITY SWEEP " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
