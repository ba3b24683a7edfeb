"""End-to-end smoke of tools/train.py main(): a 2-step things-stage run on a
synthetic FlyingThings tree with in-training Sintel validation — checks the
repaired validate-and-keep-best path (the reference's is dead code,
train_mf.py:274) and the desynced metric logging."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

H, W = 96, 128


def _write_things_tree(root: Path, n=5):
    from streamflow_tpu.data import frame_utils

    rng = np.random.default_rng(0)
    for dstype in ["frames_cleanpass", "frames_finalpass"]:
        idir = root / dstype / "TRAIN" / "A" / "0000" / "left"
        idir.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                            ).save(idir / f"{i:04d}.png")
    for sub in ["into_future", "into_past"]:
        d = root / "optical_flow" / "TRAIN" / "A" / "0000" / sub / "left"
        d.mkdir(parents=True)
        for i in range(n):
            frame_utils.write_pfm(
                str(d / f"{i:04d}.pfm"),
                rng.standard_normal((H, W, 3)).astype(np.float32))


def _write_sintel_tree(root: Path, n=4):
    from streamflow_tpu.data import frame_utils

    rng = np.random.default_rng(1)
    d = root / "training" / "clean" / "alley_1"
    d.mkdir(parents=True)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                        ).save(d / f"frame_{i + 1:04d}.png")
    fd = root / "training" / "flow" / "alley_1"
    fd.mkdir(parents=True)
    for i in range(n - 1):
        frame_utils.write_flo(
            fd / f"frame_{i + 1:04d}.flo",
            rng.standard_normal((H, W, 2)).astype(np.float32))


@pytest.mark.slow
def test_train_main_smoke(tmp_path, monkeypatch):
    things = tmp_path / "things"
    sintel = tmp_path / "sintel"
    _write_things_tree(things)
    _write_sintel_tree(sintel)
    out = tmp_path / "out"

    spec = importlib.util.spec_from_file_location(
        "train_tool", Path(__file__).resolve().parent.parent / "tools" / "train.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    argv = ["train.py", "--stage", "things", "--num_steps", "2",
            "--batch_size", "8", "--iters", "1", "--T", "4",
            "--image_size", "64", "96", "--val_freq", "2",
            "--print_freq", "1", "--num_workers", "0",
            "--validation", "sintel", "--val_iters", "1",
            "--no_mixed_precision",
            "--things_root", str(things), "--sintel_root", str(sintel),
            "--output", str(out), "--name", "smoke"]
    monkeypatch.setattr(sys, "argv", argv)
    stdout = sys.stdout
    try:
        mod.main()
    finally:
        sys.stdout = stdout

    run = out / "smoke"
    lines = [json.loads(l) for l in (run / "metrics.jsonl").read_text().splitlines()]
    assert any("loss" in l for l in lines), "train metrics logged"
    val_lines = [l for l in lines if "val" in l]
    assert val_lines and "clean_epe" in val_lines[0]["val"]
    assert (run / "best.npz").exists(), "best checkpoint written"
    assert (run / "ckpts").exists()
