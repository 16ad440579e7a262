"""Patch datasets over the native store + the WSI tiler: end-to-end
slide-image -> database -> batches, masking math vs skimage-style semantics,
bag construction."""

import os

import numpy as np
import pandas as pd
import pytest

from rnagan_tpu.data.patches import PatchBatches, load_patch_data, make_bags, slide_db_path
from rnagan_tpu.data.store import LMDBTileWriter
from rnagan_tpu.data.tiler import (
    extract_patches,
    get_mask_image,
    is_low_contrast,
    otsu_threshold,
    rgb_saturation,
    tile_slides,
)


def _fake_slide_image(w=512, h=384, seed=0):
    """Synthetic H&E-ish slide: pinkish tissue blobs on white background."""
    rng = np.random.RandomState(seed)
    img = np.full((h, w, 3), 245, np.uint8)
    for _ in range(6):
        cx, cy = rng.randint(0, w), rng.randint(0, h)
        r = rng.randint(60, 120)
        yy, xx = np.mgrid[0:h, 0:w]
        blob = (xx - cx) ** 2 + (yy - cy) ** 2 < r**2
        tissue = np.stack(
            [
                rng.randint(150, 220, blob.sum()),
                rng.randint(60, 120, blob.sum()),
                rng.randint(140, 200, blob.sum()),
            ],
            axis=-1,
        ).astype(np.uint8)
        img[blob] = tissue
    return img


def test_otsu_bimodal():
    x = np.concatenate([np.random.RandomState(0).normal(50, 5, 5000), np.random.RandomState(1).normal(200, 5, 5000)])
    t = otsu_threshold(x)
    # with an empty gap between modes, inter-class variance is flat across the
    # gap and Otsu (skimage included) returns its first maximizer, just above
    # the lower mode — anywhere separating the modes is correct
    assert 60 < t < 195


def test_otsu_matches_skimage_if_available():
    skimage_filters = pytest.importorskip("skimage.filters")
    x = np.random.RandomState(0).randint(0, 256, (64, 64)).astype(np.uint8)
    np.testing.assert_allclose(otsu_threshold(x), skimage_filters.threshold_otsu(x), atol=1.5)


def test_saturation_and_contrast():
    white = np.full((8, 8, 3), 255, np.uint8)
    assert rgb_saturation(white).max() < 1e-6
    assert is_low_contrast(white)
    img = _fake_slide_image()
    assert not is_low_contrast(img)
    mask = get_mask_image(img)
    assert 0.05 < mask.mean() < 0.9  # tissue found, background excluded


def test_extract_patches_end_to_end(tmp_path):
    from PIL import Image

    img = _fake_slide_image(1024, 768)
    slide_file = str(tmp_path / "GTEX-TEST-0001.png")
    Image.fromarray(img).save(slide_file)
    out_dir = str(tmp_path / "patches")
    mask_dir = str(tmp_path / "masks")
    n = extract_patches(
        slide_file, out_dir, "GTEX-TEST-0001",
        mask_path=mask_dir, patch_size=(64, 64), max_patches_per_slide=50,
    )
    assert n > 0
    assert os.path.exists(os.path.join(mask_dir, "GTEX-TEST-0001", "mask.npy"))
    db = os.path.join(out_dir, "GTEX-TEST-0001", "GTEX-TEST-0001.db")
    assert os.path.exists(db)

    # read back through the dataset layer
    df = pd.DataFrame(
        {
            "wsi_file_name": ["GTEX-TEST-0001"],
            "patch_data_path": [out_dir],
            "labels": [0],
            "rna_g1": [1.5],
            "rna_g2": [0.0],
        }
    )
    data = load_patch_data(df, max_patches_total=20, with_rna=True)
    assert 0 < len(data) <= 20
    assert data.images.shape[1:] == (64, 64, 3)
    assert data.rna.shape == (1, 2)
    batches = list(PatchBatches(data, batch_size=4, with_rna=True, pad_to=4).epoch(0))
    assert batches[0]["image"].shape == (4, 64, 64, 3)
    assert batches[0]["image"].min() >= -1.0 and batches[0]["image"].max() <= 1.0
    assert batches[0]["rna_data"].shape == (4, 2)


def test_tile_slides_directory(tmp_path):
    from PIL import Image

    wsi_dir = tmp_path / "wsi"
    wsi_dir.mkdir()
    for i in range(2):
        Image.fromarray(_fake_slide_image(seed=i)).save(str(wsi_dir / f"SLIDE-{i}.png"))
    done = tile_slides(str(wsi_dir), str(tmp_path / "out"), str(tmp_path / "masks"),
                       patch_size=64, max_patches_per_slide=10, verbose=False)
    assert done == 2


def test_load_patch_data_skips_missing_slides(tmp_path, capsys):
    df = pd.DataFrame({"wsi_file_name": ["NOPE.svs"], "patch_data_path": [str(tmp_path)], "labels": [1]})
    data = load_patch_data(df, verbose=True)
    assert len(data) == 0
    assert "Error with db" in capsys.readouterr().out


def test_make_bags(tmp_path, rng):
    # two synthetic slides with different tile counts
    out_dir = str(tmp_path)
    rows = []
    for s, n_tiles in (("S1", 9), ("S2", 5)):
        os.makedirs(os.path.join(out_dir, s), exist_ok=True)
        with LMDBTileWriter(slide_db_path(out_dir, s)) as w:
            for i in range(n_tiles):
                w.put_tile(f"{s}_patch_{i}", rng.randint(0, 255, (16, 16, 3), dtype=np.uint8))
        rows.append({"wsi_file_name": s, "patch_data_path": out_dir, "labels": len(rows)})
    data = load_patch_data(pd.DataFrame(rows), max_patches_total=100)
    assert len(data) == 14
    bags = make_bags(data, bag_size=4, drop_last=True)
    assert bags.bags.shape == (3, 4, 16, 16, 3)  # 2 bags from S1, 1 from S2
    bags2 = make_bags(data, bag_size=4, drop_last=False)
    assert len(bags2) == 5
    assert set(bags2.labels) == {0, 1}


def test_patient_tiles(tmp_path, rng):
    from rnagan_tpu.data.patches import patient_tiles

    out_dir = str(tmp_path)
    name = "GTEX-P1-0001.svs"
    os.makedirs(os.path.join(out_dir, name), exist_ok=True)
    with LMDBTileWriter(slide_db_path(out_dir, name)) as w:
        for i in range(8):
            w.put_tile(f"p{i}", rng.randint(0, 255, (16, 16, 3), dtype=np.uint8))
    df = pd.DataFrame({"wsi_file_name": [name], "patch_data_path": [out_dir],
                       "rna_a": [1.0], "rna_b": [2.0]})
    tiles, rna = patient_tiles(df, name, 5)
    assert tiles.shape == (5, 16, 16, 3)
    np.testing.assert_allclose(rna, [[1.0, 2.0]])
    import pytest as _pytest
    with _pytest.raises(KeyError):
        patient_tiles(df, "missing", 5)


def test_streaming_patch_batches(tmp_path, rng):
    from rnagan_tpu.data.patches import StreamingPatchBatches

    out_dir = str(tmp_path)
    rows = []
    for s in ("SA", "SB"):
        os.makedirs(os.path.join(out_dir, s), exist_ok=True)
        with LMDBTileWriter(slide_db_path(out_dir, s)) as w:
            for i in range(7):
                w.put_tile(f"{s}_p{i}", rng.randint(0, 255, (16, 16, 3), dtype=np.uint8))
        rows.append({"wsi_file_name": s, "patch_data_path": out_dir, "labels": len(rows),
                     "rna_a": float(len(rows)), "rna_b": 1.0})
    df = pd.DataFrame(rows)
    stream = StreamingPatchBatches(df, batch_size=4, max_patches_total=5,
                                   with_rna=True, with_labels=True, pad_to=4,
                                   prewarm=True)
    stream.wait_prewarm()
    batches = list(stream.epoch(0))
    assert len(batches) == len(stream) == 3  # 10 tiles -> 3 batches (padded)
    for b in batches:
        assert b["image"].shape == (4, 16, 16, 3)
        assert b["image"].min() >= -1.0 and b["image"].max() <= 1.0
        assert b["rna_data"].shape == (4, 2)
        # rna row matches the tile's slide label
        np.testing.assert_allclose(b["rna_data"][:, 0], b["labels"].astype(np.float32))
    # deterministic per epoch, different across epochs
    again = list(stream.epoch(0))
    np.testing.assert_allclose(batches[0]["image"], again[0]["image"])
    other = list(stream.epoch(1))
    assert not np.allclose(batches[0]["image"], other[0]["image"])
    stream.close()


def test_streaming_emit_uint8_matches_float_path(tmp_path, rng):
    """emit_uint8 ships the raw tile bytes; same tiles, same order as the
    float pipeline — normalization just moves onto the device (GANTrainer
    sniffs the dtype). 4x less host->device traffic in production."""
    from rnagan_tpu.data.patches import StreamingPatchBatches
    from rnagan_tpu.data.tiles import tiles_to_float

    out_dir = str(tmp_path)
    os.makedirs(os.path.join(out_dir, "S"), exist_ok=True)
    with LMDBTileWriter(slide_db_path(out_dir, "S")) as w:
        for i in range(8):
            w.put_tile(f"S_p{i}", rng.randint(0, 255, (16, 16, 3), dtype=np.uint8))
    df = pd.DataFrame([{"wsi_file_name": "S", "patch_data_path": out_dir}])
    kw = dict(batch_size=4, max_patches_total=8, pad_to=4)
    raw = StreamingPatchBatches(df, emit_uint8=True, **kw)
    flt = StreamingPatchBatches(df, **kw)
    for br, bf in zip(raw.epoch(0), flt.epoch(0)):
        assert br["image"].dtype == np.uint8
        assert bf["image"].dtype == np.float32
        np.testing.assert_allclose(tiles_to_float(br["image"]), bf["image"], atol=1e-6)
    raw.close()
    flt.close()


def test_load_bag_folder_reference_jpeg_layout(tmp_path, rng):
    """The reference's file-per-patch layout (read_data.py:60-98): per-slide
    dirs of <wsi>_patch_<i>.jpeg counted by loc.txt lines - 2; bags are
    consecutive bag_size chunks of the first max_patch_per_wsi patches."""
    from PIL import Image

    from rnagan_tpu.data.patches import load_bag_folder

    root = str(tmp_path / "jpegs")
    rows = []
    tiles_written = {}
    for s, n_tiles in [("GTEX-J1.svs", 7), ("GTEX-J2.svs", 4)]:
        d = os.path.join(root, s)
        os.makedirs(d)
        arrs = []
        for i in range(n_tiles):
            # constant-color tiles encode patch index (JPEG is ~lossless on flats)
            a = np.full((16, 16, 3), 20 + 30 * i, np.uint8)
            Image.fromarray(a).save(os.path.join(d, f"{s}_patch_{i}.jpeg"), quality=95)
            arrs.append(a)
        tiles_written[s] = arrs
        # loc.txt: 2 header lines + one line per patch (count = lines - 2)
        with open(os.path.join(d, "loc.txt"), "w") as f:
            f.write("header\nheader2\n" + "".join(f"{i},0,0\n" for i in range(n_tiles)))
        rows.append({"wsi_file_name": s, "Labels": len(rows),
                     "rna_a": float(len(rows)), "rna_b": 2.0})
    df = pd.DataFrame(rows)

    bags = load_bag_folder(df, root, bag_size=2, max_patch_per_wsi=6)
    # slide 1: min(7, 6) = 6 patches -> 3 bags; slide 2: 4 -> 2 bags
    assert bags.bags.shape == (5, 2, 16, 16, 3)
    np.testing.assert_array_equal(bags.labels, [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(bags.slide_idx, [0, 0, 0, 1, 1])
    assert bags.rna.shape == (2, 2)
    np.testing.assert_allclose(bags.rna[:, 0], [0.0, 1.0])
    # bags hold consecutive patches in index order: bag 0 = patches 0,1;
    # bag 2 = patches 4,5 (first max_patch_per_wsi=6 of 7, read_data.py:87-96)
    for bag_i, first_patch in [(0, 0), (1, 2), (2, 4)]:
        expect = [20 + 30 * (first_patch + j) for j in range(2)]
        got = bags.bags[bag_i].astype(np.float32).mean(axis=(1, 2, 3))
        np.testing.assert_allclose(got, expect, atol=3.0)

    # quick filter (read_data.py:70-71)
    only = load_bag_folder(df, root, bag_size=2, max_patch_per_wsi=6, quick=["GTEX-J2.svs"])
    assert only.slides == ["GTEX-J2.svs"] and len(only.bags) == 2

    # fusion trainer consumes the folder-loaded bags unchanged
    from rnagan_tpu.models.resnet import BasicBlock, ResNet
    from rnagan_tpu.train.fusion_trainer import FusionConfig, FusionTrainer

    import jax

    from rnagan_tpu.core.config import MeshConfig
    from rnagan_tpu.parallel.mesh import make_mesh

    cfg = FusionConfig(batch_size=2, num_epochs=1, num_classes=2, rna_hidden_dims=(4,))
    backbone = ResNet(BasicBlock, (1, 1, 1, 1), num_classes=2, compute_dtype="float32")
    mesh = make_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    tr = FusionTrainer(cfg, backbone=backbone, mesh=mesh)
    state, hist = tr.fit(bags)
    assert np.isfinite(hist["history"][0]["loss"])


def test_load_bag_hdf5_layout(tmp_path, rng):
    """The declared-intent PatchBagDatasetHDF5 (imported but never defined,
    reference ml_experiments.py:20; SURVEY.md §2.5): PatchBagDataset bag
    semantics over per-slide HDF5 stores. HDF5 is lossless, so tile
    round-trips are exact (unlike the JPEG layout)."""
    pytest.importorskip("h5py")
    from rnagan_tpu.data.patches import load_bag_hdf5, slide_hdf5_path, write_slide_hdf5

    root = str(tmp_path / "h5")
    rows, written = [], {}
    for s, n_tiles in [("GTEX-H1.svs", 7), ("GTEX-H2.svs", 4)]:
        tiles = rng.randint(0, 255, (n_tiles, 16, 16, 3), dtype=np.uint8)
        locs = np.stack([np.arange(n_tiles), np.zeros(n_tiles, int)], axis=1)
        write_slide_hdf5(slide_hdf5_path(root, s), tiles, locs)
        written[s] = tiles
        rows.append({"wsi_file_name": s, "Labels": len(rows),
                     "rna_a": float(len(rows)), "rna_b": 2.0})
    df = pd.DataFrame(rows)

    bags = load_bag_hdf5(df, root, bag_size=2, max_patch_per_wsi=6)
    # slide 1: min(7, 6) = 6 patches -> 3 bags; slide 2: 4 -> 2 bags
    assert bags.bags.shape == (5, 2, 16, 16, 3)
    np.testing.assert_array_equal(bags.labels, [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(bags.slide_idx, [0, 0, 0, 1, 1])
    assert bags.rna.shape == (2, 2)
    # exact round-trip: bag k holds patches 2k, 2k+1 in index order
    for k in range(3):
        np.testing.assert_array_equal(bags.bags[k], written["GTEX-H1.svs"][2 * k : 2 * k + 2])
    for k in range(2):
        np.testing.assert_array_equal(bags.bags[3 + k], written["GTEX-H2.svs"][2 * k : 2 * k + 2])

    # quick filter + missing-file slide skipped
    df2 = pd.concat([df, pd.DataFrame([{"wsi_file_name": "MISSING.svs", "Labels": 9,
                                        "rna_a": 9.0, "rna_b": 9.0}])], ignore_index=True)
    only = load_bag_hdf5(df2, root, bag_size=2, quick=["GTEX-H2.svs", "MISSING.svs"])
    assert only.slides == ["GTEX-H2.svs"] and len(only.bags) == 2

    # img_size resize path
    small = load_bag_hdf5(df, root, bag_size=2, img_size=8)
    assert small.bags.shape == (5, 2, 8, 8, 3)

    # the fusion trainer consumes HDF5 bags exactly like folder bags
    from rnagan_tpu.models.resnet import BasicBlock, ResNet
    from rnagan_tpu.train.fusion_trainer import FusionConfig, FusionTrainer

    import jax

    from rnagan_tpu.core.config import MeshConfig
    from rnagan_tpu.parallel.mesh import make_mesh

    cfg = FusionConfig(batch_size=2, num_epochs=1, num_classes=2, rna_hidden_dims=(4,))
    backbone = ResNet(BasicBlock, (1, 1, 1, 1), num_classes=2, compute_dtype="float32")
    mesh = make_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    tr = FusionTrainer(cfg, backbone=backbone, mesh=mesh)
    state, hist = tr.fit(bags)
    assert np.isfinite(hist["history"][0]["loss"])


def test_convert_slide_lmdb_to_hdf5(tmp_path, rng):
    """Tiler-output LMDB -> per-slide HDF5 conversion feeds load_bag_hdf5."""
    pytest.importorskip("h5py")
    from rnagan_tpu.data.patches import convert_slide_to_hdf5, load_bag_hdf5

    root, h5root = str(tmp_path / "lmdb"), str(tmp_path / "h5out")
    wsi = "GTEX-C1.svs"
    os.makedirs(os.path.join(root, wsi), exist_ok=True)
    tiles = rng.randint(0, 255, (4, 16, 16, 3), dtype=np.uint8)
    with LMDBTileWriter(slide_db_path(root, wsi)) as w:
        for i in range(4):
            w.put_tile(f"t{i}", tiles[i])
    out = convert_slide_to_hdf5(root, wsi, h5root)
    assert os.path.exists(out)
    df = pd.DataFrame([{"wsi_file_name": wsi, "Labels": 0, "rna_a": 1.0}])
    bags = load_bag_hdf5(df, h5root, bag_size=2)
    assert bags.bags.shape == (2, 2, 16, 16, 3)
    # LMDB entries are stored in the tiler's BGR convention and flipped to RGB
    # at read time (the reference's read_data.py:241 quirk), so the HDF5 file
    # holds the channel-swapped tiles; order is the writer's key order
    np.testing.assert_array_equal(bags.bags.reshape(4, 16, 16, 3), tiles[..., ::-1])


def test_streaming_corrupt_entry_replaced(tmp_path, rng):
    """A corrupt tile must be replaced by a bounded forward scan, with the
    replacement's own label/rna (not the corrupt entry's)."""
    from rnagan_tpu.data.patches import StreamingPatchBatches
    from rnagan_tpu.data.store import LMDBTileWriter

    out_dir = str(tmp_path)
    os.makedirs(os.path.join(out_dir, "SC"), exist_ok=True)
    with LMDBTileWriter(slide_db_path(out_dir, "SC")) as w:
        for i in range(5):
            w.put_tile(f"p{i}", rng.randint(0, 255, (16, 16, 3), dtype=np.uint8))
        w.put_raw(b"zz_bad", b"corrupt value")  # sorts last; sampled like a tile

    # writer appends raw keys to __keys__? ensure the corrupt key is sampled:
    df = pd.DataFrame([{"wsi_file_name": "SC", "patch_data_path": out_dir,
                        "labels": 3, "rna_a": 9.0}])
    stream = StreamingPatchBatches(df, batch_size=2, max_patches_total=100,
                                   with_rna=True, with_labels=True)
    # force the corrupt key into the index regardless of __keys__ contents
    if not any(e[1] == b"zz_bad" for e in stream._entries):
        path, _, label, sid = stream._entries[0]
        stream._entries.append((path, b"zz_bad", label, sid))
    n_batches = -(-len(stream._entries) // 2)
    seen = 0
    for b in stream.epoch(0):
        assert b["image"].shape[0] == 2
        assert np.isfinite(b["image"]).all()
        np.testing.assert_allclose(b["rna_data"][:, 0], 9.0)
        seen += 1
    assert seen == n_batches
    stream.close()


def test_convert_hdf5_fallback_key_order_and_streaming(tmp_path, rng, monkeypatch):
    """Without the __keys__ index the LMDB walk yields lexicographic byte
    order ('10' < '2'); conversion must re-sort ascii-int keys numerically so
    bag k always holds tiles [k*bag_size, (k+1)*bag_size) — and must stream
    (chunk_tiles) without changing the result."""
    pytest.importorskip("h5py")
    import h5py

    import rnagan_tpu.data.store as store_mod
    from rnagan_tpu.data.patches import convert_slide_to_hdf5, slide_hdf5_path

    root, h5root = str(tmp_path / "lmdb"), str(tmp_path / "h5out")
    wsi = "GTEX-C2.svs"
    os.makedirs(os.path.join(root, wsi), exist_ok=True)
    n = 12  # keys '0'..'11': lexicographic order interleaves '10','11' after '1'
    with LMDBTileWriter(slide_db_path(root, wsi)) as w:
        for i in range(n):
            w.put_tile(f"t{i}", np.full((8, 8, 3), i, np.uint8))

    orig = store_mod.LMDBTileStore.get_raw

    def no_index(self, key):
        return None if key == b"__keys__" else orig(self, key)

    monkeypatch.setattr(store_mod.LMDBTileStore, "get_raw", no_index)
    convert_slide_to_hdf5(root, wsi, h5root, chunk_tiles=5)  # forces streaming
    with h5py.File(slide_hdf5_path(h5root, wsi)) as f:
        vals = [int(f["patches"][i, 0, 0, 0]) for i in range(f["patches"].shape[0])]
    assert vals == list(range(n))


def test_load_bag_hdf5_zero_bag_slide_kept(tmp_path, rng):
    """A slide with fewer than bag_size patches still appears in the slide
    list (parity with load_bag_folder's unconditional append) so slide
    indexing / rna alignment matches across flavors of the same CSV."""
    pytest.importorskip("h5py")
    from rnagan_tpu.data.patches import (convert_slide_to_hdf5, load_bag_hdf5,
                                         slide_db_path as sdp)

    root, h5root = str(tmp_path / "lmdb"), str(tmp_path / "h5out")
    for wsi, count in (("A.svs", 6), ("B.svs", 2)):  # B: zero bags at size 4
        os.makedirs(os.path.join(root, wsi), exist_ok=True)
        with LMDBTileWriter(sdp(root, wsi)) as w:
            for i in range(count):
                w.put_tile(f"t{i}", np.full((8, 8, 3), i, np.uint8))
        convert_slide_to_hdf5(root, wsi, h5root)
    df = pd.DataFrame([
        {"wsi_file_name": "A.svs", "Labels": 0},
        {"wsi_file_name": "B.svs", "Labels": 1},
    ])
    bags = load_bag_hdf5(df, h5root, bag_size=4)
    assert bags.slides == ["A.svs", "B.svs"]
    assert len(bags.bags) == 1  # only A contributes a full bag
