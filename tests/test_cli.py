"""CLI layer: every command runs end-to-end on tiny synthetic data through its
reference-mirroring flag surface."""

import json
import os
import pickle

import numpy as np
import pandas as pd
import pytest

from rnagan_tpu.cli import (  # noqa: F401  (import check)
    betavae_train,
    fid as fid_cli,
    gan_train,
    generate as generate_cli,
    interpolate as interpolate_cli,
    main as main_cli,
    ml_experiment as ml_cli,
    sample as sample_cli,
    tile as tile_cli,
)

GENES = 24


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Tiny but complete experiment workspace: tissue CSVs, tiled slides,
    configs."""
    root = tmp_path_factory.mktemp("ws")
    rng = np.random.RandomState(0)

    # --- tissue CSVs with expression + slide names
    csvs = []
    slide_names = []
    for t in range(2):
        vals = rng.gamma(2.0, 30.0, size=(12, GENES))
        vals[rng.rand(12, GENES) < 0.2] = 0
        df = pd.DataFrame(vals, columns=[f"rna_ENSG{i:04d}" for i in range(GENES)])
        names = [f"GTEX-T{t}-{i:04d}.svs" for i in range(12)]
        df["wsi_file_name"] = names
        slide_names += names
        p = root / f"tissue{t}.csv"
        df.to_csv(p, index=False)
        csvs.append(str(p))

    # --- tile databases for each slide (reference layout)
    from rnagan_tpu.data.store import LMDBTileWriter

    tiles_dir = root / "tiles"
    for name in slide_names:
        os.makedirs(tiles_dir / name, exist_ok=True)
        with LMDBTileWriter(str(tiles_dir / name / name.replace(".svs", ".db"))) as w:
            for i in range(6):
                w.put_tile(f"{name}_patch_{i}", rng.randint(0, 255, (32, 32, 3), dtype=np.uint8))

    vae_config = {
        "path_csv": csvs,
        "rna_features": GENES,
        "z_dim": 16,
        "encoder_dims": [24, 16],
        "decoder_dims": [24],
        "lr": 1e-3,
        "weights_decay": 0,
        "num_epochs": 2,
        "batch_size": 8,
        "beta": 0.0005,
        "optimizer": "Adam",
        "log_interval": 10,
        "save_dir": str(root / "vae_ckpt"),
        "summary_path": str(root / "summaries"),
        "quick": False,
    }
    (root / "vae.json").write_text(json.dumps(vae_config))

    gan_config = {
        "path_csv": csvs,
        "patch_data_path": [str(tiles_dir), str(tiles_dir)],
        "img_size": 32,
        "encoding_dims": 16,
        "step_channels": 8,
        "compute_dtype": "float32",
        "rna_features": GENES,
        "z_dim": 16,
        "encoder_dims": [24, 16],
        "decoder_dims": [24],
        "max_patch_per_wsi": 6,
        "num_epochs": 1,
    }
    (root / "gan.json").write_text(json.dumps(gan_config))
    return root


def test_betavae_train_cli(workspace):
    results = betavae_train.main(["--config", str(workspace / "vae.json")])
    assert results["best_epoch"] >= 0
    assert os.path.exists(workspace / "vae_ckpt" / "model_best.ckpt")
    assert os.path.exists(workspace / "vae_ckpt" / "test_results.pkl")
    with open(workspace / "vae_ckpt" / "test_results.pkl", "rb") as f:
        tr = pickle.load(f)
    assert tr["predictions"].shape == tr["real"].shape


def test_gan_train_cli_wganvae(workspace):
    results = gan_train.main([
        "--config", str(workspace / "gan.json"),
        "--image_dir", str(workspace / "images"),
        "--model_dir", str(workspace / "gan_ckpt"),
        "--num_epochs", "1", "--num_patches", "4",
        "--gan_type", "dcgan", "--loss_type", "wganvae",
        "--vae_checkpoint", str(workspace / "vae_ckpt" / "model_best.ckpt"),
        "--batch_size", "16",
    ])
    assert np.isfinite(results["history"][0]["g_loss"])
    assert os.path.exists(workspace / "gan_ckpt" / "gan_last.model")
    assert os.path.exists(workspace / "images" / "epoch_0.png")


def test_generate_cli(workspace):
    out = str(workspace / "gen.png")
    imgs = generate_cli.main([
        "--config", str(workspace / "gan.json"),
        "--checkpoint", str(workspace / "gan_ckpt" / "gan_last.model"),
        "--vae", str(workspace / "vae_ckpt" / "model_best.ckpt"),
        "--rna_file", str(workspace / "tissue0.csv"),
        "--random_patient", "--sample_size", "8",
        "--save_path", out,
    ])
    assert os.path.exists(out)
    assert imgs.shape == (8, 32, 32, 3)
    # conditioning-preserving mode
    out2 = str(workspace / "gen_pop.png")
    generate_cli.main([
        "--config", str(workspace / "gan.json"),
        "--checkpoint", str(workspace / "gan_ckpt" / "gan_last.model"),
        "--vae", str(workspace / "vae_ckpt" / "model_best.ckpt"),
        "--rna_file", str(workspace / "tissue0.csv"),
        "--random_patient", "--sample_size", "8",
        "--condition_mode", "population",
        "--save_path", out2,
    ])
    assert os.path.exists(out2)


def test_sample_and_interpolate_cli(workspace):
    interp = str(workspace / "interp.pkl")
    report = interpolate_cli.main([
        "--config", str(workspace / "vae.json"),
        "--checkpoint", str(workspace / "vae_ckpt" / "model_best.ckpt"),
        "--save_path", interp,
    ])
    assert (0, 1) in report["difference_vectors"]

    out = str(workspace / "samples.pkl")
    expr = sample_cli.main([
        "--config", str(workspace / "vae.json"),
        "--checkpoint", str(workspace / "vae_ckpt" / "model_best.ckpt"),
        "--num_samples", "5",
        "--interpolation", interp, "--pair", "0,1",
        "--save_path", out,
    ])
    assert expr.shape == (5, GENES)
    assert os.path.exists(out)


def test_fid_cli(workspace):
    mean, std = fid_cli.main([
        "--config", str(workspace / "gan.json"),
        "--checkpoint", str(workspace / "gan_ckpt" / "gan_last.model"),
        "--vae", str(workspace / "vae_ckpt" / "model_best.ckpt"),
        "--num_images", "8", "--repetitions", "2", "--batch_size", "8",
        "--num_patches", "4",
    ])
    assert np.isfinite(mean) and std >= 0


def test_fid_cli_fake_vs_fake(workspace):
    """--checkpoint2: both sides generated per repetition (reference
    fid.py:309-323)."""
    ckpt = str(workspace / "gan_ckpt" / "gan_last.model")
    mean, std = fid_cli.main([
        "--config", str(workspace / "gan.json"),
        "--checkpoint", ckpt, "--checkpoint2", ckpt,
        "--num_images", "8", "--repetitions", "2", "--batch_size", "8",
        "--num_patches", "4",
    ])
    # same checkpoint, different sample keys: small-but-positive FID
    assert np.isfinite(mean) and std >= 0


def test_fid_cli_real_vs_real(workspace):
    """--patient1 --patient2 --real: two patients' real tiles (reference
    fid.py:325-327), second dataset via --config2 (fid.py:296-301); no
    checkpoint needed — nothing is generated in this mode."""
    mean, std = fid_cli.main([
        "--config", str(workspace / "gan.json"),
        "--config2", str(workspace / "gan.json"),
        "--patient1", "GTEX-T0-0000.svs", "--patient2", "GTEX-T1-0001.svs",
        "--real", "--num_images", "6", "--batch_size", "8",
    ])
    assert np.isfinite(mean) and std == 0.0

    # any generating mode without --checkpoint must fail loudly
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        fid_cli.main(["--config", str(workspace / "gan.json"), "--num_images", "4"])


def test_export_torch_cli_roundtrip(workspace, tmp_path):
    """Native bundle -> torchgan .model -> native again; every stage loads."""
    from rnagan_tpu.cli import export_torch as export_cli

    torch_path = export_cli.main([
        "--config", str(workspace / "gan.json"),
        "--checkpoint", str(workspace / "gan_ckpt" / "gan_last.model"),
        "--out", str(tmp_path / "ref.model"), "--epoch", "3",
    ])
    import torch

    bundle = torch.load(torch_path, map_location="cpu", weights_only=False)
    assert bundle["epoch"] == 4 and "optimizer_generator" in bundle

    native_path = export_cli.main([
        "--config", str(workspace / "gan.json"),
        "--checkpoint", torch_path,
        "--out", str(tmp_path / "back.model"), "--to_native",
    ])
    # the re-converted native bundle drives generation
    mean, std = fid_cli.main([
        "--config", str(workspace / "gan.json"),
        "--checkpoint", native_path,
        "--num_images", "8", "--repetitions", "1", "--batch_size", "8",
        "--num_patches", "4",
    ])
    assert np.isfinite(mean)


def test_tile_cli(workspace, tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    wsi_dir = tmp_path / "wsi"
    wsi_dir.mkdir()
    img = np.full((256, 256, 3), 245, np.uint8)
    img[50:200, 50:200] = rng.randint(60, 200, (150, 150, 3), dtype=np.uint8)
    Image.fromarray(img).save(str(wsi_dir / "S-1.png"))
    done = tile_cli.main([
        "--wsi_path", str(wsi_dir),
        "--patch_path", str(tmp_path / "tiles"),
        "--mask_path", str(tmp_path / "masks"),
        "--patch_size", "64", "--max_patches_per_slide", "4",
    ])
    assert done == 1


def test_main_dispatcher(capsys):
    assert main_cli.main([]) == 0
    assert "gan-train" in capsys.readouterr().out
    assert main_cli.main(["nope"]) == 2


def test_ml_experiment_cli(workspace, tmp_path):
    from PIL import Image

    rng = np.random.RandomState(2)
    tile_dir = tmp_path / "mltiles"
    tile_dir.mkdir()
    rows = []
    for i in range(24):
        label = "TCGA-GBM" if i % 2 == 0 else "TCGA-LUAD"
        arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        if label == "TCGA-GBM":
            arr = np.minimum(arr + 100, 255).astype(np.uint8)  # separable classes
        p = str(tile_dir / f"tile_{i}.png")
        Image.fromarray(arr).save(p)
        rows.append({"wsi_file_name": p, "label": label})
    csv = str(tmp_path / "tiles.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    results = ml_cli.main([
        "--csv", csv, "--num_epochs", "1", "--folds", "2",
        "--batch_size", "8", "--image_size", "32", "--arch", "resnet18",
        "--save_path", str(tmp_path / "exp.pkl"),
    ])
    assert 0.0 <= results["mean_accuracy"] <= 1.0
    assert os.path.exists(tmp_path / "exp.pkl")


def test_metrics_viewer_cli(tmp_path, capsys):
    """JSONL viewer: summary, tag table, metric sparkline + PNG export, and
    tolerance of torn tail lines from live runs."""
    import json

    from rnagan_tpu.cli import metrics as metrics_cli

    path = str(tmp_path / "run.jsonl")
    with open(path, "w") as f:
        for i in range(10):
            f.write(json.dumps({"tag": "gan", "step": i, "t": float(i),
                                "d_loss": -float(i), "fid": 100.0 - i}) + "\n")
        f.write("{torn")
    assert metrics_cli.main([path]) == 0
    assert "gan" in capsys.readouterr().out
    assert metrics_cli.main([path, "--tag", "gan", "--last", "2"]) == 0
    assert "d_loss" in capsys.readouterr().out
    png = str(tmp_path / "fid.png")
    assert metrics_cli.main([path, "--tag", "gan", "--metric", "fid", "--png", png]) == 0
    out = capsys.readouterr().out
    assert "min=91" in out and os.path.exists(png)
    assert metrics_cli.main([path, "--tag", "nope"]) == 1
