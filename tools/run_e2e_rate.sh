#!/bin/bash
# End-to-end (disk -> device) rate measurement through the REAL CLI path:
# HostLoader + native C++ npy batch reader + device prefetch + pipelined
# fused step — the number bench.py's synthetic device-resident loop cannot
# see.  Usage:  bash tools/run_e2e_rate.sh [3d|2d|both] [out_dir]
#
# Emits the trainer's own metrics.jsonl (BT = batch seconds incl. data wait,
# DT = host data wait) and prints a steady-state summary line per pipeline.
set -u
MODE="${1:-both}"
OUT="${2:-/tmp/pcrl_e2e}"
cd /root/repo
mkdir -p "$OUT"

summarize() {  # summarize <metrics.jsonl> <batch> <label>
  python - "$1" "$2" "$3" <<'EOF'
import json, sys
path, bsz, label = sys.argv[1], int(sys.argv[2]), sys.argv[3]
rows = [json.loads(l) for l in open(path)]
iters = [r for r in rows if "iter" in r and r.get("BT", 0) > 0]
# the tunnel's fresh-data upload rate is BIMODAL run-to-run (50 vs 25.5
# vols/s seen for identical configs — BENCHMARKS.md): report the MEDIAN
# per-epoch rate with the min/max spread, never a single number.
# epoch 0 is compile+cache-warm; later epochs are independent measurements.
by_epoch = {}
for r in iters:
    by_epoch.setdefault(r["epoch"], []).append(r)
rates, waits = [], []
for ep in sorted(by_epoch):
    if ep == 0:
        continue
    rs = by_epoch[ep]
    bt = sum(r["BT"] for r in rs) / len(rs)
    rates.append(bsz / bt)
    waits.append(sum(r["DT"] for r in rs) / len(rs) / bt)
if not rates:
    print(json.dumps({"label": label, "error": "need >=2 epochs"})); raise SystemExit
rates.sort()
med = rates[len(rates) // 2]
print(json.dumps({"label": label, "epochs_measured": len(rates),
                  "rate_per_sec_median": round(med, 2),
                  "rate_per_sec_min": round(rates[0], 2),
                  "rate_per_sec_max": round(rates[-1], 2),
                  "spread_frac": round((rates[-1] - rates[0]) / med, 3),
                  "data_wait_frac": round(sum(waits) / len(waits), 3)}))
EOF
}

if [ "$MODE" = "3d" ] || [ "$MODE" = "both" ]; then
  TREE="$OUT/luna_tree"
  if [ ! -d "$TREE" ]; then
    python - "$TREE" <<'EOF'
import sys
from pcrlv2_tpu.data.pipeline import write_synthetic_luna_tree
# operating scale: 2900 crop pairs (~3.2 GB) -> 63 steps/epoch at b=32
write_synthetic_luna_tree(sys.argv[1], n_subsets=10, uids_per_subset=10,
                          pairs_per_uid=29)
print("tree ready")
EOF
  fi
  rm -rf "$OUT/run3d"; mkdir -p "$OUT/run3d"
  timeout 3600 python main.py --data "$TREE" \
    --train_list "$OUT/luna_train.txt" --b 32 --epochs 4 --lr 1e-3 \
    --d 3 --n luna --workers 8 --amp --log_every 5 \
    --output "$OUT/run3d" 2>&1 | tail -3
  summarize "$OUT/run3d/metrics.jsonl" 32 "3d_e2e_disk_to_device"
fi

if [ "$MODE" = "2d" ] || [ "$MODE" = "both" ]; then
  IMGS="$OUT/chest_imgs"
  if [ ! -d "$IMGS" ]; then
    python - "$IMGS" <<'EOF'
import sys
sys.path.insert(0, "tools")
from bench_input_pipeline import _mk_chest_tree
_mk_chest_tree(sys.argv[1], 512)  # NIH-like 1024^2 grayscale PNGs
print("imgs ready")
EOF
  fi
  ls "$IMGS" | awk '{printf "%s", $1; for (i=0;i<14;i++) printf " 0"; print ""}' \
    > "$OUT/chest_train.txt"
  rm -rf "$OUT/run2d"; mkdir -p "$OUT/run2d"
  timeout 2400 python main.py --data "$IMGS" \
    --train_list "$OUT/chest_train.txt" --b 64 --epochs 5 --lr 2e-3 \
    --d 2 --n chest --workers 8 --amp --log_every 4 \
    --output "$OUT/run2d" 2>&1 | tail -3
  summarize "$OUT/run2d/metrics.jsonl" 64 "2d_e2e_disk_to_device"
fi
