"""Conv-core squeeze study (round-3 verdict stretch item 8).

The round-3 trace pinned the flagship step's remaining flat cost: ~24.4 ms
of conv fwd+bwd fusions at ~56% internal MXU efficiency (the 4-level
128-channel hourglass pyramid under-fills the MXU at small spatial sizes).
This tool runs back-to-back A/B measurements of candidate levers, each in a
FRESH SUBPROCESS (XLA flags are process-global and the compilation cache is
keyed on them):

1. baseline — current flagship step (bench.measure_tpu, batch 16, k=1).
2. XLA flag candidates via ``XLA_FLAGS`` — latency-hiding scheduler and a
   larger scoped-VMEM budget (wider fusions).  A sentinel run with a
   deliberately bogus flag first CHECKS the flags actually reach the
   compiler on this image's tunneled PJRT plugin; if the bogus flag does
   not error, flag results are meaningless and are marked ``not_propagated``.
3. batch re-sweep at the winning flags (b16 vs b32) — the round-3 sweep
   predates the layout fixes.

Writes docs/bench_conv_core.json.  Run on an otherwise-idle host.

Usage: python tools/bench_conv_core.py [--repeats 5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_MEASURE_SNIPPET = """
import json, sys
sys.path.insert(0, {repo!r})
from bench import measure_tpu
out = measure_tpu(batch={batch}, repeats={repeats})
print("RESULT " + json.dumps(out))
"""


def run_case(name: str, batch: int, repeats: int, xla_flags: str) -> dict:
    env = dict(os.environ)
    if xla_flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + xla_flags).strip()
    # Flag-dependent compiles must not collide in the shared cache dir.
    env["DSNT_COMPILE_CACHE_DIR"] = os.path.join(
        "/tmp/conv_core_cache", name.replace(" ", "_"))
    r = subprocess.run(
        [sys.executable, "-c", _MEASURE_SNIPPET.format(
            repo=REPO, batch=batch, repeats=repeats)],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            out = json.loads(line[len("RESULT "):])
            out["case"] = name
            return out
    return {"case": name, "error": (r.stdout + r.stderr)[-500:],
            "returncode": r.returncode}


def main():
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--report", default=os.path.join(
        REPO, "docs", "bench_conv_core.json"))
    args = ap.parse_args()

    results = {}

    # Does XLA_FLAGS reach the compiler at all on this PJRT transport?
    probe = run_case("bogus_flag_probe", 16, 1,
                     "--xla_this_flag_does_not_exist=1")
    flags_propagate = "error" in probe or probe.get("returncode", 0) != 0
    results["xla_flags_propagate"] = flags_propagate
    results["probe_tail"] = probe.get("error", "ran clean (flags ignored)")

    cases = [("baseline_b16", 16, "")]
    if flags_propagate:
        cases += [
            ("lhs_scheduler_b16", 16,
             "--xla_tpu_enable_latency_hiding_scheduler=true"),
            ("scoped_vmem_64m_b16", 16,
             "--xla_tpu_scoped_vmem_limit_kib=65536"),
        ]
    cases.append(("baseline_b32", 32, ""))

    for name, batch, flags in cases:
        results[name] = run_case(name, batch, args.repeats, flags)
        print(json.dumps(results[name]))

    with open(args.report, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.report}")


if __name__ == "__main__":
    main()
