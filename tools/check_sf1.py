#!/usr/bin/env python3
"""sf1 correctness gate: same canon/compare as tools/check.py, with two
scale accommodations the 10x step-up needs:

 - the three connected-component oracles (q75/q100/q168) replace the
   recursive-CTE transitive closure with an EXACT union-find over the
   same DuckDB-computed LSH pair list. The closure is O(nodes x
   component_size) rows — at 50k docs over a 31-word vocab the
   components are huge and DuckDB grinds for hours; union-find is
   linear and computes the identical min-id component labeling.
 - every other oracle runs under a per-query timeout (default 900 s) in
   a worker process, so one pathological plan can't hang the gate.

Usage: python3 tools/check_sf1.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import sys, os, json, glob
import multiprocessing as mp
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

CC_QUERIES = {"q75_dedup_clusters", "q100_leakfree_split",
              "q168_split_leak_audit"}

# oracles whose recursive/self-join SQL is super-linear at sf1 but whose
# semantics have a linear exact equivalent (computed below in Python and
# validated bit-identical against the SQL at sf0.01)
PY_ORACLES = {"q113_dedup_containment", "q166_bestfit_pack"}

P_MOD = 1000000007


def _token_hash(tok: str) -> int:
    h = 0
    for ch in tok:
        h = (h * 31 + ord(ch)) % P_MOD
    return h


def _shingle_set(text: str):
    """Distinct 2-shingle hashes, mirroring the oracle's hs CTE: 1-indexed
    i in [1, max(len-1,1)], out-of-range token hash coalesces to 0."""
    import re
    th = [_token_hash(t) for t in re.split(r"\s+", text.strip())]
    n = len(th)
    out = set()
    for i in range(1, max(n - 1, 1) + 1):
        a = th[i - 1] if i - 1 < n else 0
        b = th[i] if i < n else 0
        out.add((a * 1000003 + b) % P_MOD)
    return out


def q113_oracle(con) -> pd.DataFrame:
    """Containment pairs >= 0.8 — the SQL self-joins on the shingle
    column, which explodes to (docs-per-shingle)^2 x shingles rows over
    the tiny synthetic vocab. Equivalent: n_common is a binary
    doc x shingle matrix product (universe <= vocab^2 shingles, counts
    < 2^24 so float32 BLAS is exact)."""
    import numpy as np
    rows = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
    ids = [r[0] for r in rows]
    sets = [_shingle_set(r[1]) for r in rows]
    univ = {}
    for s in sets:
        for h in s:
            univ.setdefault(h, len(univ))
    M = np.zeros((len(ids), len(univ)), dtype=np.float32)
    for i, s in enumerate(sets):
        for h in s:
            M[i, univ[h]] = 1.0
    sizes = np.array([len(s) for s in sets], dtype=np.int64)
    out = {"doc1": [], "doc2": [], "n_common": [], "containment": []}
    B = 2048
    for lo in range(0, len(ids), B):
        hi = min(lo + B, len(ids))
        common = np.rint(M[lo:hi] @ M.T).astype(np.int64)
        m = np.minimum(sizes[lo:hi, None], sizes[None, :])
        cint = (common * 2000000 + m) // (2 * m)
        ii, jj = np.nonzero(cint >= 800000)
        for a, b in zip(ii, jj):
            gi = lo + int(a)
            if gi < int(b):  # doc1 < doc2, ids are the sorted doc_ids
                out["doc1"].append(ids[gi])
                out["doc2"].append(ids[int(b)])
                out["n_common"].append(int(common[a, b]))
                out["containment"].append(float(cint[a, b]) / 1e6)
    return pd.DataFrame(out)


def q166_oracle(con) -> pd.DataFrame:
    """Best-fit-decreasing packing per source — the SQL simulates it
    with a recursive CTE that re-copies every placement per step
    (O(chunks^2) rows). Direct simulation is O(chunks x bins)."""
    import re
    rows = con.execute(
        "SELECT source, doc_id, text FROM documents ORDER BY doc_id").fetchall()
    per_source = {}
    for src, doc, text in rows:
        w = len(re.split(r"\s+", text.strip()))
        if w <= 0:
            continue
        for c in range((w - 1) // 256 + 1):
            sz = min(256, w - c * 256)
            per_source.setdefault(src, []).append((doc, c, sz))
    out = {"source": [], "doc_id": [], "chunk_id": [], "n_toks": [],
           "bin_id": [], "bin_off": []}
    for src in sorted(per_source):
        chunks = sorted(per_source[src], key=lambda t: (-t[2], t[0], t[1]))
        bins = []  # fill per bin_id
        for doc, c, sz in chunks:
            # best fit: min remaining >= sz, tie by bin_id
            best, best_rem = -1, None
            for b, fill in enumerate(bins):
                rem = 256 - fill
                if rem >= sz and (best_rem is None or rem < best_rem):
                    best, best_rem = b, rem
            if best < 0:
                best = len(bins)
                bins.append(0)
            off = bins[best]
            bins[best] += sz
            out["source"].append(src)
            out["doc_id"].append(doc)
            out["chunk_id"].append(c)
            out["n_toks"].append(sz)
            out["bin_id"].append(best)
            out["bin_off"].append(off)
    return pd.DataFrame(out)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # identical to tools/check.py:canon — keep the two in sync
    df = df.reindex(sorted(df.columns), axis=1)
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


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def bucket(x: int) -> int:
    return ((x % 1000003) * 2654435761) % 1000


def split_of(x: int) -> str:
    b = bucket(x)
    return "train" if b < 900 else ("val" if b < 950 else "test")


def cc_oracle(name, sql, con) -> pd.DataFrame:
    """Exact union-find replacement for the reach/comp recursive CTE."""
    cut = sql.find(",\nedges AS")
    assert cut > 0, f"{name}: oracle shape changed, no edges CTE"
    pairs_sql = sql[:cut] + " SELECT doc1, doc2 FROM pairs"
    pairs = con.execute(pairs_sql).fetchall()
    docs = [r[0] for r in con.execute(
        "SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the label IS the component minimum,
            # exactly like comp AS (SELECT n, MIN(r) ... ) over the
            # full closure
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    cluster = {d: find(d) for d in docs}

    if name == "q75_dedup_clusters":
        return pd.DataFrame({
            "doc_id": docs,
            "cluster_id": [cluster[d] for d in docs],
            "is_keeper": [int(cluster[d] == d) for d in docs]})
    if name == "q100_leakfree_split":
        return pd.DataFrame({
            "doc_id": docs,
            "cluster_id": [cluster[d] for d in docs],
            "split": [split_of(cluster[d]) for d in docs]})
    if name == "q168_split_leak_audit":
        n_pairs = len(pairs)
        cross_doc = sum(1 for a, b in pairs
                        if split_of(a) != split_of(b))
        cross_cl = sum(1 for a, b in pairs
                       if split_of(cluster[a]) != split_of(cluster[b]))
        def leak(nc):
            return 0.0 if n_pairs == 0 else \
                float((nc * 2000000 + n_pairs) // (n_pairs * 2)) / 1e6
        return pd.DataFrame({
            "rule": ["cluster_hash", "doc_hash"],
            "n_pairs": [n_pairs, n_pairs],
            "n_cross": [cross_cl, cross_doc],
            "leak_frac": [leak(cross_cl), leak(cross_doc)]})
    raise AssertionError(name)


def run_oracle(sf_dir, name, sql, q):
    try:
        con = connect(sf_dir)
        if name in CC_QUERIES:
            df = cc_oracle(name, sql, con)
        elif name == "q113_dedup_containment":
            df = q113_oracle(con)
        elif name == "q166_bestfit_pack":
            df = q166_oracle(con)
        else:
            df = con.execute(sql).df()
        q.put(("ok", df))
    except Exception as e:
        q.put(("err", str(e)[:300]))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 900
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_tmo = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output", flush=True); n_fail += 1
            continue
        q = mp.Queue()
        p = mp.Process(target=run_oracle, args=(sf_dir, name, sql, q))
        p.start()
        try:
            status, want = q.get(timeout=timeout)
        except Exception:
            p.kill(); p.join()
            print(f"TIMEOUT {name}: oracle exceeded {timeout}s", flush=True)
            n_tmo += 1
            continue
        p.join()
        if status == "err":
            print(f"FAIL {name}: oracle error: {want}", flush=True)
            n_fail += 1
            continue
        # compare semantics identical to tools/check.py: int/float dtype
        # divergence is a FAIL, values compare exact (the driver hashes
        # values; the queries cast to DECIMAL before SUM so double
        # order-dependence never reaches the result)
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        want = canon(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}",
                  flush=True)
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}", flush=True)
            n_fail += 1
            continue
        dtype_bad = []
        for c in got.columns:
            g_int = pd.api.types.is_integer_dtype(got[c])
            w_int = pd.api.types.is_integer_dtype(want[c])
            g_flt = pd.api.types.is_float_dtype(got[c])
            w_flt = pd.api.types.is_float_dtype(want[c])
            if (g_int and w_flt) or (g_flt and w_int):
                dtype_bad.append(f"{c}: spark={got[c].dtype} oracle={want[c].dtype}")
        if dtype_bad:
            print(f"FAIL {name}: int/float dtype divergence ({'; '.join(dtype_bad)})",
                  flush=True)
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)", flush=True); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else e}",
                  flush=True)
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_tmo} timeout ==", flush=True)
    sys.exit(1 if (n_fail or n_tmo) else 0)


if __name__ == "__main__":
    main()
