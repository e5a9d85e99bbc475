#!/usr/bin/env bash
# Standing per-round close-out gate (round-11 VERDICT #2): the sf1
# step-up is no longer a one-round event — every round runs the full
# inventory at BOTH sf0.1 (driver parity) and sf1 (10x), plus the full
# per-query bench JSON artifact (VERDICT #3), so a regression at 10x
# can't hide behind the small-SF gate.
#
# Usage: tools/round_close.sh <round-number>
# Produces (committed by the caller):
#   CORRECTNESS_sf1_r<N>.json  — per-query pass/fail at sf1
#   BENCH_sf1_r<N>.json        — full per-query bench at sf1
#   BENCH_r<N>.json            — full per-query bench at sf0.1
#   ZIPF_r<N>.json             — dedup-family scale gate at 100k Zipf
#                                docs (census/candidate ratios + flags)
set -euo pipefail
cd "$(dirname "$0")/.."
R="${1:?usage: tools/round_close.sh <round>}"
SF1_DIR="${SF1_DIR:-/root/repo/testdata_sf1}"
SF01_DIR="${SF01_DIR:-/root/testdata/sf0.1}"

if [ ! -d "$SF1_DIR" ]; then
  echo "[round_close] generating sf1 fixture at $SF1_DIR"
  python3 tools/gen_sf1.py "$SF1_DIR" 1
fi

echo "[round_close] 1/3 Verify + oracle at sf1"
VOUT="$(mktemp -d /tmp/graft_verify_sf1.XXXX)"
sbt -batch "runMain graft.Verify $SF1_DIR $VOUT" >/dev/null
# check_sf1 exits 1 when any query fails — the gate must still WRITE
# the failure record and run the benches (set -e would otherwise kill
# the very artifact that exists to show which queries regressed)
python3 tools/check_sf1.py "$SF1_DIR" "$VOUT" | tee /tmp/check_sf1_r"$R".txt \
  || echo "[round_close] sf1 gate has FAILURES (recorded in artifact)"
# NB: the report lines come in by PATH (argv), not stdin — `python3 -`
# reads the PROGRAM from stdin, so a second stdin redirect would feed
# the heredoc to the parser and silently produce an empty summary
python3 - "$R" /tmp/check_sf1_r"$R".txt >"CORRECTNESS_sf1_r$R.json" <<'EOF'
import sys, json, re
rows = {}
for line in open(sys.argv[2]):
    m = re.match(r"(PASS|FAIL|TIMEOUT) (\S+?):?\s", line.strip() + " ")
    if m: rows[m.group(2).rstrip(':')] = m.group(1).lower()
summary = {"round": int(sys.argv[1]), "sf": "sf1",
           "pass": sum(v == "pass" for v in rows.values()),
           "fail": sum(v == "fail" for v in rows.values()),
           "timeout": sum(v == "timeout" for v in rows.values()),
           "queries": rows}
print(json.dumps(summary, indent=1, sort_keys=True))
EOF

echo "[round_close] 2/3 Bench at sf1"
SPARK_GRAFT_SF_DIR="$SF1_DIR" SPARK_GRAFT_BENCH_OUT="BENCH_sf1_r$R.json" \
  sbt -batch "runMain graft.Bench" | tail -1

# The sf0.1 record IS the round's bench artifact (r11 verdict #4):
# one self-contained file with the full per-query map + per-iteration
# times/load/gc, machine-diffable against the previous round. No more
# separate bench_full_r<N>.json, no stale bench_out.json in the repo.
echo "[round_close] 3/3 full Bench at sf0.1"
SPARK_GRAFT_SF_DIR="$SF01_DIR" SPARK_GRAFT_BENCH_OUT="BENCH_r$R.json" \
  sbt -batch "runMain graft.Bench" | tail -1

# Standing Zipf scale gate (r12 verdict #4): the sf gates run on the
# closed 31-word vocabulary, where dedup SCALE-SHAPE regressions (a
# dispatch flipping to the wrong arm, a governor admitting quadratic
# candidates) are invisible. One 100k-doc probe of the candidate-
# generation family, flagged on CENSUS/CANDIDATE RATIOS — wall time is
# environment-noisy, the ratios are not. Thresholds = 2x the measured
# round-13 values (SCALE.md round 13).
echo "[round_close] 4/4 Zipf dedup-family scale gate (100k docs)"
ZDIR="${ZIPF_DIR:-/tmp/zipf_100k}"
if [ ! -f "$ZDIR/documents.parquet" ]; then
  python3 tools/gen_zipf_docs.py "$ZDIR" 100000
fi
for t in region nation customer supplier part orders lineitem events embeddings; do
  ln -sf "$SF01_DIR/$t.parquet" "$ZDIR/$t.parquet"
done
sbt -batch "runMain graft.ZipfProbe $ZDIR zipf-100k" 2>/dev/null \
  | grep zipf_dedup_probe | sed 's/^\[info\] //' > /tmp/zipf_r"$R".json
python3 - "$R" /tmp/zipf_r"$R".json >"ZIPF_r$R.json" <<'EOF'
import sys, json
d = json.load(open(sys.argv[2]))
flags = []
def ratio(a, b): return (a / b) if b else 0.0
q65 = d.get("q65_census", {})
q113 = d.get("q113_census", {})
q114 = d.get("q114_census", {})
q114c = d.get("q114_capped_census", {})
qq = d.get("queries", {})
checks = {
    # (value, threshold, direction) — reference values measured r13:
    # q65 candidates/naive 0.059, q113 prefix/naive 0.0014,
    # q114 governed<=full by construction, truth recall ratio 1.0
    "q65_arm_prefix": (q65.get("arm") == "prefix", True, "eq"),
    "q65_cand_vs_naive": (ratio(q65.get("candidates", 0),
                                q65.get("naive_join_rows", 0)), 0.12, "max"),
    "q113_arm_prefix": (q113.get("arm") == "prefix", True, "eq"),
    "q113_prefix_vs_naive": (ratio(q113.get("prefix_join_rows", 0),
                                   q113.get("naive_join_rows", 0)), 0.003, "max"),
    "q114_admitted_vs_budget": (ratio(q114.get("capped_pairs", 0),
                                      max(q114.get("budget", 1), 1)), 1.0, "max"),
    "q114_truth_recall": (ratio(q114.get("truth_in_governed", 0),
                                max(q114.get("truth_in_uncapped", 1), 1)),
                          0.995, "min"),
    # CAPPED-regime governor checks (r13 verdict #1): a budget=1/doc
    # census on the same corpus forces cap selection — the regime that
    # actually governs at 200k+ docs. The cap must engage, admit within
    # budget, and lose <0.5% of banding-recoverable truth pairs.
    "q114c_cap_engaged": (q114c.get("cap", 0) > 0, True, "eq"),
    "q114c_admitted_vs_budget": (ratio(q114c.get("capped_pairs", 0),
                                       max(q114c.get("budget", 1), 1)), 1.0, "max"),
    "q114c_truth_recall": (ratio(q114c.get("truth_in_governed", 0),
                                 max(q114c.get("truth_in_uncapped", 1), 1)),
                           0.995, "min"),
    # idf-weighted SimHash pair volume vs the unweighted form (r13
    # verdict #6): the weighting's whole point is collapsing the
    # saturated-fingerprint pair blowup (measured r13: 0.053); a
    # regression toward unweighted behavior flags here.
    "q67w_pairs_vs_q67": (ratio(qq.get("q67_weighted_simhash", {}).get("rows", 0),
                                max(qq.get("q67_dedup_simhash", {}).get("rows", 1), 1)),
                          0.12, "max"),
}
for name, (val, thr, kind) in checks.items():
    ok = (val == thr) if kind == "eq" else \
         (val <= thr) if kind == "max" else (val >= thr)
    if not ok: flags.append({"check": name, "value": val, "threshold": thr})
out = {"round": int(sys.argv[1]), "flags": flags, "checks": {
    k: {"value": v[0], "threshold": v[1], "kind": v[2]} for k, v in checks.items()},
    "probe": d}
print(json.dumps(out, indent=1, sort_keys=True))
if flags:
    print(f"[zipf_gate] {len(flags)} FLAG(S): " +
          ", ".join(f["check"] for f in flags), file=sys.stderr)
    # the gate GATES (r13 ADVICE): a scale-shape regression fails the
    # close-out, not just the artifact. ZIPF_GATE_STRICT=0 to inspect a
    # flagged artifact without aborting (the JSON is already written).
    import os
    if os.environ.get("ZIPF_GATE_STRICT", "1") != "0":
        sys.exit(1)
EOF

# a stale generic bench_out.json must never shadow the official
# BENCH_r<N>.json records (r12 verdict #7)
rm -f bench_out.json

echo "[round_close] artifacts: CORRECTNESS_sf1_r$R.json BENCH_sf1_r$R.json BENCH_r$R.json ZIPF_r$R.json"
