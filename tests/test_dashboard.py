"""Dashboard server tests: routes serve page, metrics stream, and samples."""

import json

import pytest
import os
import urllib.request

from dsnt_pose2d_tpu.train.dashboard import serve


def test_dashboard_routes(tmp_path):
    (tmp_path / "samples").mkdir()
    (tmp_path / "samples" / "epoch0000_s0.png").write_bytes(b"\x89PNG fake")
    with open(tmp_path / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"epoch": 0, "train_loss": 1.0}) + "\n")
        f.write(json.dumps({"epoch": 0, "val_pckh": 0.5}) + "\n")

    server = serve(str(tmp_path), port=0)  # ephemeral port
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "dsnt-pose2d-tpu" in page and "canvas" in page
        metrics = urllib.request.urlopen(f"{base}/metrics").read().decode()
        assert "train_loss" in metrics
        samples = json.loads(urllib.request.urlopen(f"{base}/samples").read())
        assert samples == ["epoch0000_s0.png"]
        png = urllib.request.urlopen(f"{base}/samples/epoch0000_s0.png").read()
        assert png.startswith(b"\x89PNG")
        try:
            urllib.request.urlopen(f"{base}/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_metric_writer_tensorboard(tmp_path):
    pytest.importorskip("tensorboard")
    from dsnt_pose2d_tpu.train.metrics import MetricWriter

    w = MetricWriter(str(tmp_path), echo=False, tensorboard=True)
    w.write({"epoch": 0, "step": 3, "loss": 1.25, "note": "skip-me",
             "is_best": True})
    w.write({"epoch": 1, "train_loss": 0.5, "val_pckh": 0.9})
    import numpy as np

    w.image("samples/skeleton", np.zeros((8, 8, 3), np.float32), 1)
    w.close()
    tb_dir = tmp_path / "tb"
    events = list(tb_dir.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0

    # Step-level scalars go under train/<k> @ step; epoch-level summaries
    # under epoch/<k> and val/<k> @ epoch; bools and strings are JSONL-only.
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)

    acc = EventAccumulator(str(tb_dir))
    acc.Reload()
    # flax's SummaryWriter emits TF v2 summaries; EventAccumulator surfaces
    # those under "tensors" (the "scalars" bucket only holds v1 events).
    tags = set(acc.Tags()["tensors"]) | set(acc.Tags()["scalars"])
    assert "train/loss" in tags
    assert "epoch/train_loss" in tags
    assert "val/pckh" in tags
    assert not any("is_best" in t or "note" in t for t in tags)
    assert acc.Tensors("train/loss")[0].step == 3
    assert acc.Tensors("val/pckh")[0].step == 1
