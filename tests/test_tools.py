"""Tests for the round-gate tooling in tools/.

close_the_loop.py is the SURVEY "open items" closure script: it must run
cleanly TODAY (empty reference mount -> stub report, exit 0) and actually
close the loop the day the mount is populated (layout diff + op bit-parity
vs the real torch ops + number re-pinning).  The populated path is rehearsed
against a synthetic tree backed by the repo's own independent torch oracle.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "close_the_loop.py")


def _run(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, SCRIPT, *args], cwd=cwd,
                          capture_output=True, text=True, env=env,
                          timeout=600)


def test_empty_mount_is_a_clean_noop(tmp_path):
    empty = tmp_path / "ref"
    empty.mkdir()
    out = tmp_path / "report.json"
    r = _run(["--reference", str(empty), "--out", str(out)], cwd=REPO)
    assert r.returncode == 0, r.stderr
    report = json.loads(out.read_text())
    assert report["census"]["n_files"] == 0
    assert "blocked" in report["status"]


@pytest.mark.slow
def test_populated_mount_runs_layout_diff_and_op_parity(tmp_path):
    """Synthetic reference tree built on the torch oracle: every op the
    script probes must come back within fp64 reduction noise, and the
    convention probes must pin pixel-center grids + sigma-in-pixels."""
    ref = tmp_path / "ref"
    (ref / "dsnt").mkdir(parents=True)
    (ref / "dsnt" / "__init__.py").write_text("")
    oracle_dir = os.path.join(REPO, "tests", "oracle")
    (ref / "dsnt" / "nn.py").write_text(textwrap.dedent(f"""\
        import sys
        sys.path.insert(0, {oracle_dir!r})
        from torch_oracle import (dsnt, flat_softmax, make_gauss,
                                  kl_reg_losses, js_reg_losses,
                                  mse_reg_losses, variance_reg_losses,
                                  euclidean_losses, average_loss)
        kl_reg_loss = kl_reg_losses
        js_reg_loss = js_reg_losses
        mse_reg_loss = mse_reg_losses
        """))
    (ref / "README.md").write_text("| hg8 dsnt js | PCKh total 87.21 |\n")
    out = tmp_path / "report.json"
    r = _run(["--reference", str(ref), "--out", str(out),
              "--goldens-out", str(tmp_path / "goldens_ref.npz")], cwd=REPO)
    assert r.returncode == 0, r.stderr + r.stdout
    report = json.loads(out.read_text())

    layout = report["layout"]
    assert "dsnt/nn.py" in layout["found"]
    assert "dsnt/model.py" in layout["survey_predicted_but_absent"]

    ops = report["op_parity"]["ops"]
    for name in ("flat_softmax", "dsnt", "kl_reg_loss", "js_reg_loss",
                 "mse_reg_loss", "make_gauss(sigma=1px)"):
        assert name in ops, sorted(ops)
        assert "error" not in ops[name], ops[name]
        assert ops[name]["max_abs_dev"] < 1e-9, (name, ops[name])

    probes = report["op_parity"]["probes"]
    assert probes["grid_convention"]["pixel_center_formula_matches"]
    assert probes["gauss"]["sigma_unit_guess"] == "pixels"
    assert probes["gauss"]["normalized_to_1"]

    numbers = report["numbers"]["candidate_lines"]
    assert any("87.21" in h["text"] for h in numbers)

    # Step 5: goldens regenerated FROM THE REFERENCE MODULE and the whole
    # parity suite re-run against them, unattended, inside this one command.
    regen = report["golden_regen"]
    assert regen["status"] == "ran", regen
    assert regen["parity_suite"]["passed"], regen["parity_suite"]
    assert os.path.exists(regen["goldens"])
