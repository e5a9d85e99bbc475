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
#   bench_full_r<N>.json       — full per-query bench at sf0.1
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

echo "[round_close] artifacts: CORRECTNESS_sf1_r$R.json BENCH_sf1_r$R.json BENCH_r$R.json"
