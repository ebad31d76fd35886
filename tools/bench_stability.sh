#!/bin/bash
# Three consecutive bench.py runs (VERDICT r4 item 2: the stability proof
# is all metrics within ±20% across runs). Outputs land in
# docs/bench_stability_r5/run{1,2,3}.jsonl and a summary table is printed.
# bench.py is now self-healing (subprocess groups + backoff retries), so
# each run gets the full orchestrator budget rather than an outer timeout.
set -u
cd "$(dirname "$0")/.."
OUT=docs/bench_stability_r5
mkdir -p "$OUT"
for i in 1 2 3; do
    echo "=== bench run $i ($(date -u +%H:%M:%S)) ===" >&2
    # relay slow phases can stretch a cached group to ~15 min; give each
    # stability run more headroom than the driver default
    ORION_BENCH_BUDGET_S=10800 python -u bench.py > "$OUT/run$i.jsonl" 2>/dev/null
    echo "--- run $i done (rc=$?) ($(date -u +%H:%M:%S))" >&2
done
python - <<'EOF'
import json, collections
vals = collections.defaultdict(list)
for i in (1, 2, 3):
    for line in open(f"docs/bench_stability_r5/run{i}.jsonl"):
        line = line.strip()
        if not line.startswith("{"):
            continue
        r = json.loads(line)
        if "value" in r:
            vals[r["metric"]].append(r["value"])
print(f"{'metric':44s} {'r1':>9} {'r2':>9} {'r3':>9} {'spread':>7}")
for m, v in vals.items():
    if len(v) == 3 and min(v) > 0:
        spread = (max(v) - min(v)) / (sum(v) / 3) * 100
        flag = "" if spread <= 40 else "  <-- WIDE"
        print(f"{m:44s} {v[0]:9.1f} {v[1]:9.1f} {v[2]:9.1f} "
              f"{spread:6.1f}%{flag}")
    else:
        print(f"{m:44s} incomplete: {v}")
EOF
