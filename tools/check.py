#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate:
run Verify's parquet output against DuckDB oracles on the same sf tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to us; widen ints (the driver's hash treats
    # int32/int64 as equal); keep floats EXACT — the driver hashes values,
    # so any numeric fudge here hides real divergence (round-1 lesson:
    # 4 hash failures passed a lenient local check)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype) in ("int32", "int16", "int8"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        # dtype-strict on the int-vs-float axis: the driver hashes VALUES,
        # and a DuckDB HUGEINT (bare SUM) surfaces as float64 ("2.0") while
        # Spark emits int64 ("2") — values equal, hash differs. r5 lesson:
        # check_dtype=False was blind to exactly this (q128/q138/q141/q151).
        dtype_bad = []
        for c in got.columns:
            g_int = pd.api.types.is_integer_dtype(got[c])
            w_int = pd.api.types.is_integer_dtype(want[c])
            g_flt = pd.api.types.is_float_dtype(got[c])
            w_flt = pd.api.types.is_float_dtype(want[c])
            if (g_int and w_flt) or (g_flt and w_int):
                dtype_bad.append(f"{c}: spark={got[c].dtype} oracle={want[c].dtype}")
        if dtype_bad:
            print(f"FAIL {name}: int/float dtype divergence ({'; '.join(dtype_bad)})")
            n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
