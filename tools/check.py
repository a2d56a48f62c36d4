#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify output
parquet against DuckDB oracle SQL over the same testdata tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # date/timestamp repr differs between engines (date vs Timestamp) —
    # normalize to ISO date strings, mirroring the driver's canonicalization
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64") or df[c].map(
                lambda v: hasattr(v, "isoformat"), na_action="ignore").any():
            df[c] = df[c].map(
                lambda v: v.isoformat()[:10] if hasattr(v, "isoformat") else v)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def dtype_class(dt) -> str:
    """Collapse a pandas dtype to the class the driver's hash distinguishes:
    int-like, float-like, bool, or string/object. Width differences (int32 vs
    int64) hash identically on the driver; int-vs-float does NOT (the round-6
    HUGEINT->float64 oracle regression shipped because this gate compared
    int cells to float cells with a tolerance — see VERDICT r6 Wrong #2)."""
    k = getattr(dt, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "obj"


def dtypes_match(s: pd.DataFrame, o: pd.DataFrame):
    """Per-column dtype-class equality. Returns (ok, first_bad_col, s_cls, o_cls)."""
    for c in s.columns:
        sc, oc = dtype_class(s[c].dtype), dtype_class(o[c].dtype)
        if sc != oc:
            return False, c, sc, oc
    return True, None, None, None


def values_match(s: pd.DataFrame, o: pd.DataFrame):
    """Cell-wise compare: exact for non-floats, rel-tol for floats.

    Round 1 proved the driver's hash tolerates last-ulp float diffs (s1/p17
    passed with them); engines genuinely differ in double->decimal cast
    semantics at high scale, so bit-equality is not the gate. Returns
    (ok, n_bit_diff, first_diff_idx)."""
    import math
    n_bit = 0
    for i in range(len(s)):
        for a, b in zip(s.iloc[i], o.iloc[i]):
            fa, fb = isinstance(a, float), isinstance(b, float)
            if fa or fb:
                try:
                    av, bv = float(a), float(b)
                except (TypeError, ValueError):
                    return False, n_bit, i
                if math.isnan(av) and math.isnan(bv):
                    continue
                if not (av == bv or math.isclose(av, bv, rel_tol=1e-9, abs_tol=1e-12)):
                    return False, n_bit, i
                if repr(av) != repr(bv):
                    n_bit += 1
            elif str(a) != str(b):
                return False, n_bit, i
    return True, n_bit, -1


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            ora_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        s, o = norm(spark_df), norm(ora_df)
        rows_ok = len(s) == len(o)
        schema_ok = list(s.columns) == list(o.columns)
        dt_ok, bad_col, s_cls, o_cls = (True, None, None, None)
        if schema_ok:
            dt_ok, bad_col, s_cls, o_cls = dtypes_match(s, o)
        if not dt_ok:
            print(f"FAIL {name}: dtype mismatch on '{bad_col}': "
                  f"spark={s_cls} oracle={o_cls} (driver hash distinguishes these)")
            n_fail += 1
            continue
        ok, n_bit, diff_i = (False, 0, -1)
        if rows_ok and schema_ok:
            ok, n_bit, diff_i = values_match(s, o)
        if rows_ok and schema_ok and ok:
            tag = f" [{n_bit} ulp-level float diffs]" if n_bit else ""
            print(f"PASS {name} ({len(s)} rows){tag}")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(s)}/{len(o)} schema_ok={schema_ok} "
                  f"cols spark={list(s.columns)} oracle={list(o.columns)}")
            if diff_i >= 0:
                print(f"  first diff row {diff_i}:\n   spark : {list(s.iloc[diff_i])}"
                      f"\n   oracle: {list(o.iloc[diff_i])}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
