"""End-to-end smoke of tools/quality_run.py (the FID-vs-epoch validation
harness) at ultra-tiny shapes on CPU: corpus build, on-device epoch program,
whitened FID probe with real-vs-real floor, sample grids, resume."""

import json
import os
import sys

import numpy as np

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)


def _run(argv, tmp_path):
    import quality_run

    old = sys.argv
    sys.argv = ["quality_run.py"] + argv
    try:
        quality_run.main()
    finally:
        sys.argv = old


def test_quality_run_wganvae_smoke(tmp_path):
    wd = str(tmp_path / "q")
    out = os.path.join(wd, "wganvae.json")
    _run(["--loss_type", "wganvae", "--slides", "4", "--tiles_per_slide", "6",
          "--genes", "32", "--size", "32", "--batch", "4", "--vae_epochs", "2",
          "--epochs", "2", "--fid_n", "8", "--fid_batch", "8",
          "--save_every", "1", "--workdir", wd], tmp_path)
    with open(out) as f:
        result = json.load(f)
    hist = result["history"]
    assert len(hist) == 2
    assert all(np.isfinite([h["d_loss"], h["g_loss"], h["fid"]]).all() for h in hist)
    assert result["meta"]["fid_floor_real_vs_real"] >= 0.0
    assert os.path.exists(os.path.join(wd, "grids", "real.png"))
    assert os.path.exists(os.path.join(wd, "grids", "wganvae_epoch001.png"))
    assert os.path.exists(os.path.join(wd, "wganvae_last.model"))

    # resume extends the same history without redoing finished epochs
    _run(["--loss_type", "wganvae", "--slides", "4", "--tiles_per_slide", "6",
          "--genes", "32", "--size", "32", "--batch", "4", "--vae_epochs", "2",
          "--epochs", "3", "--fid_n", "8", "--fid_batch", "8",
          "--save_every", "1", "--workdir", wd, "--resume"], tmp_path)
    with open(out) as f:
        resumed = json.load(f)
    assert len(resumed["history"]) == 3
    assert resumed["history"][:2] == hist


def test_quality_run_wgan_smoke(tmp_path):
    wd = str(tmp_path / "qw")
    _run(["--loss_type", "wgan", "--slides", "4", "--tiles_per_slide", "6",
          "--genes", "32", "--size", "32", "--batch", "4",
          "--epochs", "1", "--fid_n", "8", "--fid_batch", "8",
          "--workdir", wd], tmp_path)
    with open(os.path.join(wd, "wgan.json")) as f:
        result = json.load(f)
    assert len(result["history"]) == 1
    assert np.isfinite(result["history"][0]["fid"])
