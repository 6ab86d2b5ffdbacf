"""Heatmap-resolution ablation: DSNT vs heatmap-matching as resolution drops.

The companion paper's CENTRAL finding (SURVEY.md §6 "Low-res advantage",
BASELINE qualitative claim): with a ResNet backbone, DSNT beats
heatmap-matching (`gauss`) by a wide margin at LOW heatmap resolutions and
the gap narrows as resolution grows — because DSNT's expectation decode is
sub-pixel while argmax+quarter-offset quantizes to the heatmap grid.  The
reference sweeps resolution via the ResNet `dilate` flag (stride->dilation
swap in the last N stages; each dilated stage doubles the output heatmap).

This sweeps `--dilate {0,1,2}` x `--output-strat {dsnt,gauss}` on a ResNet
backbone over the dress-rehearsal fixture and tabulates PCKh@0.5.  At
256 px input, dilate 0/1/2 = 8x8 / 16x16 / 32x32 heatmaps.

Usage (after tools/dress_rehearsal.py --stages fabricate,prepare,pack):

    python tools/ablation_resolution.py --data-dir /tmp/dress_rehearsal \
        --epochs 10 --base-model resnet34

Writes <data-dir>/ablation_resolution.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os

from _ablation_common import HEAD_FLAGS, train_and_eval


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--base-model", default="resnet34")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--dilates", default="0,1,2")
    p.add_argument("--heads", default="dsnt,gauss")
    p.add_argument("--out-dir", default="")
    args = p.parse_args()
    out_root = args.out_dir or os.path.join(args.data_dir,
                                            "ablation_resolution")

    results = {}
    for dilate in [int(d) for d in args.dilates.split(",")]:
        for head in args.heads.split(","):
            key = f"dilate{dilate}_{head}"
            r = train_and_eval(
                args.data_dir, out_root, key,
                ["--base-model", args.base_model, "--dilate", str(dilate),
                 *HEAD_FLAGS[head],
                 "--batch-size", str(args.batch_size),
                 "--epochs", str(args.epochs)])
            r.pop("table", None)
            results[key] = {"dilate": dilate, "head": head, **r}
            print(f"== {key}: PCKh {results[key]['pckh_total']} ==",
                  flush=True)

    path = os.path.join(args.data_dir, "ablation_resolution.json")
    meta = {"base_model": args.base_model, "epochs": args.epochs,
            "batch_size": args.batch_size, "results": results}
    json.dump(meta, open(path, "w"), indent=1)
    print(f"wrote {path}")
    print("| dilate | heatmap | dsnt PCKh | gauss PCKh | gap |")
    print("|---|---|---|---|---|")
    for dilate in [int(d) for d in args.dilates.split(",")]:
        d = results.get(f"dilate{dilate}_dsnt", {}).get("pckh_total")
        g = results.get(f"dilate{dilate}_gauss", {}).get("pckh_total")
        hm = 8 * (2 ** dilate)
        gap = (round(d - g, 2) if d is not None and g is not None else "")
        print(f"| {dilate} | {hm}x{hm} | {d} | {g} | {gap} |")


if __name__ == "__main__":
    main()
