"""Pretrained-vs-from-scratch finetune ablation on the structured phantom task.

The question every "plumbing proven" caveat left open: does the 4-term PCRLv2
pretraining objective actually produce transferable features?  Real LUNA16 is
env-blocked, so this uses the structured synthetic task
(``write_structured_luna_tree``): blob segmentation with bright planar
distractors, where a pure intensity rule caps at Dice ~0.38 (measured) and
features must be *learned* — unlike the round-4 ``pseudo_mask`` task, which a
threshold solves exactly.

Protocol (all end-to-end through the CLI, reference recipe README.md:29-55):

1. Generate the phantom tree with matched masks (fixed seed; train list
   shuffled so the finetune complement spans all folds).
2. Pretrain ``--phase pretask`` on the first ``--ratio`` share of UIDs for
   100 epochs (the reference checkpoint cadence saves the epoch-100 ``.pt``).
3. Finetune twice under an identical small budget on the complement split
   with REAL masks (``--mask_dir``): once from the pretrained ``.pt``
   (``--weight``), once from scratch.  Held-out Dice (folds 7-9) every epoch.
4. Emit a side-by-side eval-curve table + SUMMARY.md into ``--artifacts``.

Run: ``python tools/ablation_pretrain_vs_scratch.py --work /tmp/ablation_r5
--artifacts artifacts/ablation_r5``  (~25 min through the tunnel).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sh(args, log_path):
    print("==>", " ".join(args), flush=True)
    with open(log_path, "w") as log:
        proc = subprocess.run(args, stdout=log, stderr=subprocess.STDOUT,
                              cwd=REPO)
    if proc.returncode != 0:
        tail = open(log_path).read()[-2000:]
        raise SystemExit(f"FAILED rc={proc.returncode}: {' '.join(args)}\n"
                         f"--- log tail ---\n{tail}")


def read_evals(metrics_path):
    """epoch → {eval_dice, eval_loss} rows from a finetune metrics.jsonl."""
    rows = {}
    with open(metrics_path) as f:
        for line in f:
            r = json.loads(line)
            if "eval_dice" in r:
                rows[int(r["epoch"])] = {"dice": r["eval_dice"],
                                         "loss": r["eval_loss"]}
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work", default="/tmp/ablation_r5")
    p.add_argument("--artifacts", default="artifacts/ablation_r5")
    p.add_argument("--ratio", default=0.5, type=float)
    p.add_argument("--pre_epochs", default=100, type=int,
                   help="pretrain epochs (100 = reference .pt cadence)")
    p.add_argument("--ft_epochs", default=15, type=int,
                   help="fixed finetune budget for BOTH arms")
    p.add_argument("--ft_lr", default=1e-3, type=float)
    p.add_argument("--b", default=16, type=int)
    p.add_argument("--ft_b", default=8, type=int)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--skip_pretrain", action="store_true",
                   help="reuse an existing pretrained .pt in --work")
    args = p.parse_args()

    work = args.work
    tree = os.path.join(work, "tree")
    os.makedirs(work, exist_ok=True)

    # 1. phantom tree + shuffled train list (shuffling matters: UIDs are
    # generated subset-major, and the finetune split is the list's tail —
    # unshuffled, the complement would land entirely in the valid folds)
    lst = os.path.join(tree, "luna_train.txt")
    if not os.path.exists(lst):
        import numpy as np

        from pcrlv2_tpu.data.pipeline import write_structured_luna_tree

        uids = write_structured_luna_tree(tree, n_subsets=10,
                                          uids_per_subset=4,
                                          pairs_per_uid=4, seed=7)
        np.random.RandomState(11).shuffle(uids)
        with open(lst, "w") as f:
            f.write("\n".join(uids) + "\n")
        print(f"==> tree: {len(uids)} uids under {tree}")

    # 2. pretrain
    pre_out = os.path.join(work, "pretrain")
    pre_pt = os.path.join(
        pre_out, f"pcrlv2_luna_pretask_{args.ratio}_{args.pre_epochs}.pt")
    if not (args.skip_pretrain and os.path.exists(pre_pt)):
        sh([sys.executable, "main.py", "--d", "3", "--n", "luna",
            "--phase", "pretask", "--data", tree, "--train_list", lst,
            "--ratio", str(args.ratio), "--b", str(args.b),
            "--epochs", str(args.pre_epochs), "--lr", "1e-3", "--amp",
            "--seed", str(args.seed), "--output", pre_out],
           os.path.join(work, "pretrain.log"))
    if not os.path.exists(pre_pt):
        raise SystemExit(f"pretrained checkpoint missing: {pre_pt}")

    # 3. the two finetune arms — identical budget, data, seed; only init
    # differs
    common = [sys.executable, "main.py", "--d", "3", "--n", "luna",
              "--phase", "finetune", "--data", tree, "--train_list", lst,
              "--mask_dir", tree, "--ratio", str(args.ratio),
              "--b", str(args.ft_b), "--epochs", str(args.ft_epochs),
              "--lr", str(args.ft_lr), "--eval_every", "1",
              "--seed", str(args.seed)]
    ft_pre = os.path.join(work, "ft_pretrained")
    ft_scr = os.path.join(work, "ft_scratch")
    for out in (ft_pre, ft_scr):
        if os.path.isdir(out):
            shutil.rmtree(out)
    sh(common + ["--weight", pre_pt, "--output", ft_pre],
       os.path.join(work, "ft_pretrained.log"))
    sh(common + ["--output", ft_scr], os.path.join(work, "ft_scratch.log"))

    # 4. comparison table + artifacts
    pre_rows = read_evals(os.path.join(ft_pre, "metrics.jsonl"))
    scr_rows = read_evals(os.path.join(ft_scr, "metrics.jsonl"))
    epochs = sorted(set(pre_rows) & set(scr_rows))
    if not epochs:
        raise SystemExit(
            f"no common eval epochs between the two arms "
            f"(pretrained: {sorted(pre_rows)}, scratch: {sorted(scr_rows)}) "
            f"— check {ft_pre}/metrics.jsonl and {ft_scr}/metrics.jsonl "
            "for eval_dice rows")
    lines = ["| epoch | pretrained Dice | scratch Dice | Δ |",
             "|---|---|---|---|"]
    for e in epochs:
        d_p, d_s = pre_rows[e]["dice"], scr_rows[e]["dice"]
        lines.append(f"| {e} | {d_p:.4f} | {d_s:.4f} | {d_p - d_s:+.4f} |")
    best_p = max(r["dice"] for r in pre_rows.values())
    best_s = max(r["dice"] for r in scr_rows.values())
    final_p = pre_rows[epochs[-1]]["dice"]
    final_s = scr_rows[epochs[-1]]["dice"]
    verdict = ("PRETRAINED WINS" if best_p > best_s and final_p > final_s
               else "scratch matches or beats pretrained — honest negative")
    table = "\n".join(lines)
    print(table)
    print(f"best: pretrained {best_p:.4f} vs scratch {best_s:.4f}; "
          f"final: {final_p:.4f} vs {final_s:.4f} -> {verdict}")

    art = args.artifacts
    os.makedirs(art, exist_ok=True)
    for src, dst in ((os.path.join(ft_pre, "metrics.jsonl"),
                      "ft_pretrained_metrics.jsonl"),
                     (os.path.join(ft_scr, "metrics.jsonl"),
                      "ft_scratch_metrics.jsonl"),
                     (os.path.join(pre_out, "metrics.jsonl"),
                      "pretrain_metrics.jsonl")):
        if os.path.exists(src):
            shutil.copy(src, os.path.join(art, dst))
    with open(os.path.join(art, "summary.json"), "w") as f:
        json.dump({"config": vars(args), "epochs": epochs,
                   "pretrained": pre_rows, "scratch": scr_rows,
                   "best_pretrained": best_p, "best_scratch": best_s,
                   "final_pretrained": final_p, "final_scratch": final_s,
                   "verdict": verdict}, f, indent=1)
    with open(os.path.join(art, "TABLE.md"), "w") as f:
        f.write(table + "\n")
    print(f"==> artifacts in {art}")


if __name__ == "__main__":
    main()
