"""Regularizer ablation: none vs var vs kl vs js vs mse for the DSNT head.

The companion paper's regularizer table (SURVEY.md §6 "Regularizer ordering
at sigma_t~1"): with a DSNT output head, the distribution regularizers order
JS >= KL >= variance >= none on PCKh@0.5 (MSE-vs-Gaussian is also swept).
This reproduces that qualitative ordering on the dress-rehearsal fixture
with a dilated-ResNet backbone, all other knobs fixed.  ``--sigmas`` adds a
target-Gaussian sigma sweep for one regularizer (the paper sweeps
sigma_t in {0.5, 1, 2} px).

Usage (after tools/dress_rehearsal.py --stages fabricate,prepare,pack):

    python tools/ablation_reg.py --data-dir /tmp/dress_rehearsal \
        --epochs 10 --base-model resnet34 --dilate 1 --sigmas 0.5,2.0

Writes <data-dir>/ablation_reg.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os

from _ablation_common import train_and_eval


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--base-model", default="resnet34")
    p.add_argument("--dilate", type=int, default=1)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--hm-sigma", type=float, default=1.0)
    p.add_argument("--regs", default="none,var,kl,js,mse")
    p.add_argument("--sigmas", default="",
                   help="optional extra hm-sigma values swept with --sigma-reg "
                        "(paper sweeps sigma_t in {0.5,1,2} px); comma list")
    p.add_argument("--sigma-reg", default="js")
    p.add_argument("--out-dir", default="")
    args = p.parse_args()
    out_root = args.out_dir or os.path.join(args.data_dir, "ablation_reg")

    # (label, reg, sigma) variants: the regularizer sweep at the default
    # sigma, plus an optional sigma sweep for one regularizer.
    variants = [(f"reg_{reg}", reg, args.hm_sigma)
                for reg in args.regs.split(",") if reg]
    for s in (args.sigmas.split(",") if args.sigmas else []):
        if abs(float(s) - args.hm_sigma) < 1e-9 and args.sigma_reg in \
                args.regs.split(","):
            continue  # already covered by the reg sweep
        variants.append((f"sigma_{s}_{args.sigma_reg}", args.sigma_reg,
                         float(s)))

    results = {}
    for key, reg, sigma in variants:
        r = train_and_eval(
            args.data_dir, out_root, key,
            ["--base-model", args.base_model, "--dilate", str(args.dilate),
             "--output-strat", "dsnt", "--reg", reg,
             "--reg-coeff", "1.0", "--hm-sigma", str(sigma),
             "--batch-size", str(args.batch_size),
             "--epochs", str(args.epochs)])
        r.pop("table", None)
        results[key] = {"reg": reg, "hm_sigma": sigma, **r}
        print(f"== {key}: PCKh {results[key]['pckh_total']} ==", flush=True)

    path = os.path.join(args.data_dir, "ablation_reg.json")
    meta = {"base_model": args.base_model, "dilate": args.dilate,
            "epochs": args.epochs, "batch_size": args.batch_size,
            "hm_sigma": args.hm_sigma, "results": results}
    json.dump(meta, open(path, "w"), indent=1)
    print(f"wrote {path}")
    print("| variant | reg | sigma | PCKh@0.5 total |")
    print("|---|---|---|---|")
    for key, r in results.items():
        print(f"| {key} | {r['reg']} | {r['hm_sigma']} | {r['pckh_total']} |")


if __name__ == "__main__":
    main()
