"""Head-ablation sweep (BASELINE config #4): dsnt vs gauss vs fc on TPU.

Trains the same backbone with each of the three output strategies on the
dress-rehearsal fixture (or any prepared data dir) and tabulates PCKh@0.5 —
the paper's central ablation (DSNT > heatmap-matching > FC at equal
backbone), demonstrated at meaningful scale on the fabricated release-layout
dataset (round-2 VERDICT item 9).

Usage (after tools/dress_rehearsal.py --stages fabricate,prepare,pack):

    python tools/ablation_heads.py --data-dir /tmp/dress_rehearsal \
        --epochs 8 --base-model hg2

Writes <data-dir>/ablation_heads.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os

from _ablation_common import HEAD_FLAGS, train_and_eval


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--base-model", default="hg2")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--out-dir", default="")
    p.add_argument("--heads", default="dsnt,gauss,fc")
    args = p.parse_args()
    out_root = args.out_dir or os.path.join(args.data_dir, "ablation")

    results = {}
    for head in args.heads.split(","):
        results[head] = train_and_eval(
            args.data_dir, out_root, head,
            ["--base-model", args.base_model, *HEAD_FLAGS[head],
             "--batch-size", str(args.batch_size),
             "--epochs", str(args.epochs)])
        print(f"== {head}: PCKh {results[head]['pckh_total']} ==", flush=True)

    path = os.path.join(args.data_dir, "ablation_heads.json")
    meta = {"base_model": args.base_model, "epochs": args.epochs,
            "batch_size": args.batch_size, "results": results}
    json.dump(meta, open(path, "w"), indent=1)
    print(f"wrote {path}")
    print("| head | PCKh@0.5 total |")
    print("|---|---|")
    for head, r in results.items():
        print(f"| {head} | {r['pckh_total']} |")


if __name__ == "__main__":
    main()
