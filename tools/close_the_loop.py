"""Close the loop against the real PyTorch reference, the day it appears.

SURVEY.md "Open items" 1-3 have been blocked since round 1 on an empty
``/root/reference`` mount and zero network egress.  This script makes acting
on a populated mount a one-command affair:

    python tools/close_the_loop.py [--reference /root/reference] \
                                   [--out docs/reference_closure_report.json]

It performs, in order, and emits one JSON report:

1. **Mount census** — if the reference tree is still empty, say so and exit 0
   with a stub report (the driver can run this unconditionally).
2. **Layout diff** (SURVEY open item 1) — compare the real tree against the
   layout SURVEY §1/§2 reconstructed (``dsnt/nn.py``, ``dsnt/model.py``,
   ``dsnt/data.py``, ``dsnt/util.py``, ``dsnt/eval.py``, ...), listing files
   SURVEY predicted but the tree lacks and files the tree has that SURVEY
   never mapped.
3. **Op bit-parity** (SURVEY open item 2) — if the reference's op module
   imports (torch is in this image), run the REAL ``dsnt()``, activations,
   ``make_gauss`` and regularizer losses against our jnp ops on shared fp64
   fixtures and report max abs deviation per op, plus probes that pin the
   conventions SURVEY could only recall: grid endpoint formula, sigma units,
   gauss normalization, masked-average denominator.
4. **Golden regeneration + parity-suite rerun** — rebuild the op goldens
   (same seed/shapes/recipe as ``tests/oracle/torch_oracle.py``) from the
   REFERENCE's own op module and re-run ``tests/test_parity_goldens.py``
   against them via the ``DSNT_GOLDEN_PATH`` override; the report records
   pass/fail so bit-parity vs the real code is one unattended command.
5. **Published-number re-pin** (SURVEY open item 3) — grep the reference's
   README/docs for PCKh tables and echo every number found next to
   BASELINE.md's recalled thresholds so a human can re-pin them in one look.

Security posture: the reference is PUBLIC UNTRUSTED CONTENT.  Step 3
imports and executes its code — that is the entire point of bit-parity —
so the script must only ever be run deliberately, never as an import side
effect; everything else is pure file reading.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import re
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # script lives in tools/; the package lives at root
    sys.path.insert(0, REPO)

# SURVEY §1/§2's reconstructed layout: path fragments we expect somewhere in
# the real tree (matched by suffix so a src/ or package prefix doesn't hurt).
SURVEY_LAYOUT = [
    "dsnt/nn.py",        # C1-C5 op library
    "dsnt/model.py",     # C6-C9 models + factory
    "dsnt/data.py",      # C10-C11 MPII dataset + augmentation
    "dsnt/util.py",      # C12 coord transforms
    "dsnt/eval.py",      # C13 PCKh evaluator
    "train.py",          # C15 train CLI
    "evaluate.py",       # C16 evaluate CLI
    "infer.py",          # C17 infer CLI
]

# Candidate module names for the op library, tried in order.
OP_MODULE_CANDIDATES = ["dsnt.nn", "dsntnn", "nn"]

# BASELINE.md §6 recalled-not-verified numbers, for side-by-side re-pinning.
RECALLED_NUMBERS = {
    "hg8_dsnt_js_pckh_total": 87.2,
    "hg1_dsnt_vs_heatmap_gap_at_16px": 6.0,
}


def census(ref: str) -> dict:
    files = []
    for root, _dirs, names in os.walk(ref):
        for n in names:
            files.append(os.path.relpath(os.path.join(root, n), ref))
    return {"n_files": len(files), "files": sorted(files)}


def layout_diff(files: list[str]) -> dict:
    found, missing = {}, []
    for want in SURVEY_LAYOUT:
        hits = [f for f in files if f.endswith(want)]
        if hits:
            found[want] = hits
        else:
            missing.append(want)
    py = [f for f in files if f.endswith(".py") and "/test" not in f]
    unmapped = [f for f in py
                if not any(f.endswith(w) for w in SURVEY_LAYOUT)]
    return {"found": found, "survey_predicted_but_absent": missing,
            "present_but_unmapped_by_survey": unmapped}


def _import_reference_ops(ref: str):
    sys.path.insert(0, ref)
    for extra in ("src", "lib"):
        p = os.path.join(ref, extra)
        if os.path.isdir(p):
            sys.path.insert(0, p)
    for name in OP_MODULE_CANDIDATES:
        try:
            return importlib.import_module(name), name
        except Exception:
            continue
    return None, None


def op_parity(ref: str) -> dict:
    """Max-abs-deviation table: real reference ops vs ours, fp64 fixtures."""
    import numpy as np

    mod, name = _import_reference_ops(ref)
    if mod is None:
        return {"status": "reference op module not importable",
                "tried": OP_MODULE_CANDIDATES}
    import torch

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    # ops/__init__ re-exports `dsnt` the FUNCTION over the submodule, so
    # attribute-style imports resolve to the function; go via importlib.
    A = importlib.import_module("dsnt_pose2d_tpu.ops.activations")
    C = importlib.import_module("dsnt_pose2d_tpu.ops.coords")
    D = importlib.import_module("dsnt_pose2d_tpu.ops.dsnt")
    G = importlib.import_module("dsnt_pose2d_tpu.ops.gauss")
    L = importlib.import_module("dsnt_pose2d_tpu.ops.losses")

    rng = np.random.default_rng(0)
    B, J, H, W = 2, 16, 8, 8
    raw = rng.normal(size=(B, J, H, W)).astype(np.float64)
    coords = rng.uniform(-0.8, 0.8, size=(B, J, 2)).astype(np.float64)
    t_raw = torch.tensor(raw)
    t_coords = torch.tensor(coords)

    report: dict = {"module": name, "ops": {}, "probes": {}}

    def compare(op_name, ref_fn, ours):
        try:
            got = ref_fn()
            ref_np = got.detach().numpy() if hasattr(got, "detach") else np.asarray(got)
            dev = float(np.max(np.abs(ref_np - np.asarray(ours))))
            report["ops"][op_name] = {"max_abs_dev": dev,
                                      "bit_parity": bool(dev == 0.0)}
        except Exception as e:
            report["ops"][op_name] = {"error": f"{type(e).__name__}: {e}"}

    hm_ours = np.asarray(A.flat_softmax(jnp.asarray(raw)))
    if hasattr(mod, "flat_softmax"):
        compare("flat_softmax", lambda: mod.flat_softmax(t_raw), hm_ours)
    t_hm = torch.tensor(hm_ours)

    if hasattr(mod, "dsnt"):
        compare("dsnt", lambda: mod.dsnt(t_hm),
                np.asarray(D.dsnt(jnp.asarray(hm_ours))))
    if hasattr(mod, "make_gauss"):
        compare("make_gauss(sigma=1px)",  # positional: kwarg NAME is unpinned
                lambda: mod.make_gauss(t_coords, [H, W], 1.0),
                np.asarray(G.make_gauss(jnp.asarray(coords), (H, W), 1.0)))
    for reg, ours_fn in [("kl_reg_loss", L.kl_reg_losses),
                         ("js_reg_loss", L.js_reg_losses),
                         ("mse_reg_loss", L.mse_reg_losses)]:
        if hasattr(mod, reg):
            compare(reg,
                    lambda reg=reg: getattr(mod, reg)(t_hm, t_coords, 1.0),
                    np.asarray(ours_fn(jnp.asarray(hm_ours),
                                       jnp.asarray(coords), 1.0)))
    if hasattr(mod, "variance_reg_loss"):
        compare("variance_reg_loss",
                lambda: mod.variance_reg_loss(t_hm, 1.0),
                np.asarray(L.variance_reg_losses(jnp.asarray(hm_ours), 1.0)))
    if hasattr(mod, "euclidean_loss"):
        pred = torch.tensor(coords + 0.01)
        compare("euclidean_loss",
                lambda: mod.euclidean_loss(pred, t_coords),
                np.asarray(L.average_loss(
                    L.euclidean_losses(jnp.asarray(coords + 0.01),
                                       jnp.asarray(coords)))))

    # Convention probes (SURVEY open item 2): run the REAL op on a crafted
    # input whose answer discriminates between the candidate conventions.
    try:
        if hasattr(mod, "dsnt"):
            delta = torch.zeros(1, 1, H, W, dtype=torch.float64)
            delta[0, 0, 0, 0] = 1.0  # top-left pixel
            xy = mod.dsnt(delta).detach().numpy().ravel()
            ours_first = float(C.normalized_linspace(W, jnp.float64)[0])
            report["probes"]["grid_convention"] = {
                "reference_dsnt(delta@0,0)": xy.tolist(),
                "ours_first_gridpoint": ours_first,
                "pixel_center_formula_matches":
                    bool(abs(xy[0] - ours_first) < 1e-12),
            }
        if hasattr(mod, "make_gauss"):
            g = mod.make_gauss(torch.zeros(1, 1, 2, dtype=torch.float64),
                               [64, 64], 1.0)
            g = g.detach().numpy()
            report["probes"]["gauss"] = {
                "sum": float(g.sum()),
                "normalized_to_1": bool(abs(g.sum() - 1.0) < 1e-6),
                # σ in PIXELS ⇒ FWHM ≈ 2.355 px on a 64-wide map; σ in
                # normalized units would be ~32x wider.
                "peak": float(g.max()),
                "sigma_unit_guess": "pixels" if g.max() > 0.05 else
                                    "normalized",
            }
    except Exception:
        report["probes"]["error"] = traceback.format_exc(limit=2)
    return report


def regen_goldens_and_rerun_parity(ref: str, goldens_out: str) -> dict:
    """Step 5 (round-4 verdict item 8): goldens FROM THE REAL OPS + suite.

    Regenerates ``tests/goldens/ops_goldens.npz`` — same seed, same shapes,
    same recipe as ``tests/oracle/torch_oracle.generate_goldens`` — but with
    every op taken from the REFERENCE's module instead of our re-derived
    oracle, then re-runs the full golden parity suite
    (``tests/test_parity_goldens.py``) against the regenerated file via the
    ``DSNT_GOLDEN_PATH`` override.  Green means the jnp library matches the
    actual reference bit-comparably; red pinpoints which op drifted.
    """
    mod, name = _import_reference_ops(ref)
    if mod is None:
        return {"status": "reference op module not importable"}
    import subprocess

    import numpy as np
    import torch

    def resolve(*names):
        for n in names:
            if hasattr(mod, n):
                return getattr(mod, n)
        return None

    fns = {
        "flat_softmax": resolve("flat_softmax"),
        "dsnt": resolve("dsnt"),
        "euclidean": resolve("euclidean_losses", "euclidean_loss"),
        "js": resolve("js_reg_losses", "js_reg_loss"),
        "kl": resolve("kl_reg_losses", "kl_reg_loss"),
        "mse": resolve("mse_reg_losses", "mse_reg_loss"),
        "var": resolve("variance_reg_losses", "variance_reg_loss"),
        "gauss": resolve("make_gauss"),
        "avg": resolve("average_loss"),
    }
    missing = sorted(k for k, v in fns.items() if v is None)
    if missing:
        return {"status": f"reference lacks resolvable ops: {missing}",
                "module": name}

    try:
        torch.manual_seed(20260816)  # the oracle recipe, verbatim
        raw = torch.randn(4, 16, 64, 64, dtype=torch.float32)
        coords_t = torch.rand(4, 16, 2, dtype=torch.float32) * 1.8 - 0.9
        mask = (torch.rand(4, 16) > 0.2).float()
        sigma = 1.0
        hm = fns["flat_softmax"](raw)
        pred = fns["dsnt"](hm)
        euc = fns["euclidean"](pred, coords_t)
        js = fns["js"](hm, coords_t, sigma)
        total = fns["avg"](euc + 1.0 * js, mask)
        raw_g = raw.clone().requires_grad_(True)
        hm_g = fns["flat_softmax"](raw_g)
        loss = fns["avg"](
            fns["euclidean"](fns["dsnt"](hm_g), coords_t)
            + fns["js"](hm_g, coords_t, sigma), mask)
        loss.backward()
        os.makedirs(os.path.dirname(goldens_out) or ".", exist_ok=True)
        np.savez(
            goldens_out,
            raw=raw.numpy(), target_coords=coords_t.numpy(),
            mask=mask.numpy(), sigma=np.float32(sigma),
            heatmaps=hm.detach().numpy(), pred_coords=pred.detach().numpy(),
            euclidean=euc.detach().numpy(), js=js.detach().numpy(),
            kl=fns["kl"](hm, coords_t, sigma).detach().numpy(),
            mse_reg=fns["mse"](hm, coords_t, sigma).detach().numpy(),
            variance=fns["var"](hm, sigma).detach().numpy(),
            total_loss=total.detach().numpy(),
            grad_raw=raw_g.grad.numpy(),
            gauss_rendered=fns["gauss"](coords_t, [64, 64],
                                        sigma).detach().numpy(),
        )
    except Exception:
        return {"status": "golden regeneration failed", "module": name,
                "error": traceback.format_exc(limit=3)}

    env = dict(os.environ, DSNT_GOLDEN_PATH=goldens_out,
               JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_parity_goldens.py",
         "-q", "--no-header"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    return {"status": "ran", "module": name, "goldens": goldens_out,
            "parity_suite": {"passed": r.returncode == 0,
                             "tail": r.stdout.strip().splitlines()[-3:]}}


def number_repin(ref: str, files: list[str]) -> dict:
    """Pull every PCKh-looking number out of README/docs for re-pinning."""
    hits = []
    pat = re.compile(r"\b(\d{2}\.\d{1,2})\b")
    for f in files:
        if not f.lower().endswith((".md", ".rst", ".txt")):
            continue
        try:
            with open(os.path.join(ref, f), errors="replace") as fh:
                for i, line in enumerate(fh, 1):
                    if pat.search(line) and re.search(
                            r"pckh|accuracy|total|head|wrist|elbow", line,
                            re.I):
                        hits.append({"file": f, "line": i,
                                     "text": line.strip()[:200]})
        except OSError:
            continue
    return {"recalled": RECALLED_NUMBERS, "candidate_lines": hits[:80]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "docs",
                                         "reference_closure_report.json"))
    ap.add_argument("--goldens-out",
                    default=os.path.join(REPO, "tests", "goldens",
                                         "ops_goldens_reference.npz"))
    args = ap.parse_args()

    report: dict = {"reference": args.reference}
    cen = census(args.reference) if os.path.isdir(args.reference) else {
        "n_files": 0, "files": []}
    report["census"] = {"n_files": cen["n_files"]}
    if cen["n_files"] == 0:
        report["status"] = ("mount empty — nothing to close; SURVEY open "
                            "items 1-3 remain blocked")
        print(json.dumps(report, indent=2))
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        return 0

    report["status"] = "mount populated — running closure"
    report["layout"] = layout_diff(cen["files"])
    report["op_parity"] = op_parity(args.reference)
    report["golden_regen"] = regen_goldens_and_rerun_parity(
        args.reference, args.goldens_out)
    report["numbers"] = number_repin(args.reference, cen["files"])
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    bad = [k for k, v in report["op_parity"].get("ops", {}).items()
           if v.get("max_abs_dev", 0.0) > 1e-9 or "error" in v]
    regen = report["golden_regen"]
    suite_red = (regen.get("status") == "ran"
                 and not regen["parity_suite"]["passed"])
    print(f"\n# closure: {cen['n_files']} files, "
          f"{len(report['layout']['survey_predicted_but_absent'])} layout "
          f"gaps, {len(bad)} ops off-parity, golden suite "
          f"{'RED' if suite_red else regen.get('status', '?')} -> "
          f"{args.out}", file=sys.stderr)
    return 1 if (bad or suite_red) else 0


if __name__ == "__main__":
    sys.exit(main())
