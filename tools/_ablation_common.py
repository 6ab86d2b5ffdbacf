"""Shared orchestration for the ablation sweep tools.

Each ablation (heads / resolution / regularizer) is a grid of
train-then-evaluate runs over the dress-rehearsal fixture; the subprocess
plumbing and PCKh-table parsing live here so a change to the CLI output
format (e.g. the split-provenance line) is fixed once, not three times.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reg only applies to the dsnt head (paper setup: JS at sigma_t=1).
HEAD_FLAGS = {
    "dsnt": ["--output-strat", "dsnt", "--reg", "js", "--reg-coeff", "1.0"],
    "gauss": ["--output-strat", "gauss"],
    "fc": ["--output-strat", "fc"],
}


def run(argv, timeout=14400):
    print("  $", " ".join(argv), flush=True)
    r = subprocess.run(argv, cwd=REPO, capture_output=True, text=True,
                       timeout=timeout)
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-4000:])
        raise RuntimeError(f"command failed: {' '.join(argv)}")
    return r.stdout


def train_and_eval(data_dir: str, out_root: str, experiment_id: str,
                   train_flags: list) -> dict:
    """One grid cell: train with the flags, evaluate, parse the PCKh table.

    Returns ``{"pckh_total": float|None, "train_s": float, "table": [str]}``.
    """
    t0 = time.time()
    # Resume if this grid cell already has checkpoints (interrupted sweep):
    # a fully-trained cell restores past its last epoch and is a no-op.
    resume = (["--resume"] if os.path.isdir(
        os.path.join(out_root, experiment_id, "ckpt")) else [])
    run([sys.executable, "-m", "dsnt_pose2d_tpu.cli.train",
         "--data-dir", data_dir, "--data-source", "auto",
         *train_flags, *resume,
         "--out-dir", out_root, "--experiment-id", experiment_id])
    out = run([sys.executable, "-m", "dsnt_pose2d_tpu.cli.evaluate",
               "--model-dir", os.path.join(out_root, experiment_id),
               "--data-dir", data_dir])
    table = out[out.index("PCKh"):] if "PCKh" in out else out
    m = re.search(r"^\s*total\s+([0-9.]+)", table, re.M)
    return {"pckh_total": float(m.group(1)) if m else None,
            "train_s": round(time.time() - t0, 1),
            "table": table.strip().splitlines()}
