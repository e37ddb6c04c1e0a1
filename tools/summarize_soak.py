"""Summarize a soak run's metrics.jsonl for STATUS.md.

Prints: steady-state step rate, a per-epoch loss table (subsampled), eval
rows, checkpoint epochs found in the output dir, and — when the log holds a
resume boundary — the loss continuity across it.

Usage: python tools/summarize_soak.py <output_dir> [table_every]
"""

import json
import os
import sys


def main():
    out = sys.argv[1]
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]

    epochs = [r for r in rows if "epoch_time" in r]
    iters = [r for r in rows if "iter" in r and r.get("BT", 0) > 0]
    evals = [r for r in rows if "eval" in r]

    if iters:
        tail = [r for r in iters if r["epoch"] >= 1]
        bt = sorted(r["BT"] for r in tail)[len(tail) // 2] if tail else 0
        print(f"steady-state median BT {bt:.3f}s "
              f"({32/bt:.1f} vols/s at b=32), {len(iters)} iter rows")
    if epochs:
        print(f"{len(epochs)} epochs logged, "
              f"epoch time median "
              f"{sorted(r['epoch_time'] for r in epochs)[len(epochs)//2]:.1f}s")
        print("\n| epoch | loss | cos | mg | local | epoch_s |")
        print("|---|---|---|---|---|---|")
        picked = [r for r in epochs
                  if r["epoch"] % every == 0] + [epochs[-1]]
        seen = set()
        for r in picked:
            if r["epoch"] in seen:
                continue
            seen.add(r["epoch"])
            print(f"| {r['epoch']} | {r['loss']:+.4f} | "
                  f"{r['cos_loss']:+.4f} | {r['mg_loss']:.4f} | "
                  f"{r['local_loss']:+.4f} | {r['epoch_time']:.1f} |")
        first, last = epochs[0], epochs[-1]
        print(f"\nloss {first['loss']:+.4f} (epoch {first['epoch']}) -> "
              f"{last['loss']:+.4f} (epoch {last['epoch']}); "
              f"declined: {last['loss'] < first['loss']}")
    if evals:
        print("\neval rows:")
        for r in evals:
            e = r["eval"]
            print(f"  epoch {r['epoch']}: loss {e['loss']:+.4f} "
                  f"mg {e['mg_loss']:.4f}")
    orbax = os.path.join(out, "orbax")
    if os.path.isdir(orbax):
        steps = sorted(int(d) for d in os.listdir(orbax) if d.isdigit())
        print(f"\norbax checkpoints at epochs: {steps}")
    pts = sorted(f for f in os.listdir(out) if f.endswith(".pt"))
    print(f".pt artifacts: {pts}")


if __name__ == "__main__":
    main()
