"""ResNet family, fusion models, and the downstream CV classification
experiment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnagan_tpu.core.config import MeshConfig
from rnagan_tpu.models.fusion import AggregationModel, FusionModel
from rnagan_tpu.models.resnet import (
    ResNet,
    BasicBlock,
    init_resnet,
    params_from_torch_state_dict,
    resnet18,
    resnet50,
)
from rnagan_tpu.train.ml_experiment import (
    MLConfig,
    TileClassifierTrainer,
    run_cv_experiment,
    stratified_folds,
    weighted_f1,
)

TINY = ResNet(BasicBlock, (1, 1, 1, 1), num_classes=2, compute_dtype="float32")


def test_resnet_shapes_and_extract(rng):
    variables = init_resnet(TINY, jax.random.key(0), image_size=32)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    logits = TINY.apply(variables, x, train=False)
    assert logits.shape == (2, 2)
    feats = TINY.apply(variables, x, train=False, extract=True)
    assert feats.shape == (2, 512)  # BasicBlock: 64*2^3


def test_resnet50_structure():
    model = resnet50(num_classes=3, compute_dtype="float32")
    variables = init_resnet(model, jax.random.key(0), image_size=64)
    feats_kernel = variables["params"]["fc"]["kernel"]
    assert feats_kernel.shape == (2048, 3)  # Bottleneck expansion 4
    assert "layer4_2" in variables["params"]


def test_input_channel_variants(rng):
    for ch, size in ((1, 32), (4, 32)):
        model = ResNet(BasicBlock, (1, 1, 1, 1), num_classes=2, in_channels=ch, compute_dtype="float32")
        variables = init_resnet(model, jax.random.key(0), image_size=size)
        x = jnp.asarray(rng.rand(2, size, size, ch), jnp.float32)
        assert model.apply(variables, x, train=False).shape == (2, 2)


def test_torch_state_dict_port_parity(rng):
    """Round-trip: build a torch-layout state_dict from our params and port it
    back; also check 1-ch/4-ch first-conv surgery."""
    model = resnet18(num_classes=5, compute_dtype="float32")
    variables = init_resnet(model, jax.random.key(1), image_size=32)
    sd = {}
    p, s = variables["params"], variables["batch_stats"]

    def put_conv(prefix, kern):
        sd[prefix + ".weight"] = np.asarray(kern).transpose(3, 2, 0, 1)

    def put_bn(prefix, bn_p, bn_s):
        sd[prefix + ".weight"] = np.asarray(bn_p["scale"])
        sd[prefix + ".bias"] = np.asarray(bn_p["bias"])
        sd[prefix + ".running_mean"] = np.asarray(bn_s["mean"])
        sd[prefix + ".running_var"] = np.asarray(bn_s["var"])

    put_conv("conv1", p["conv1"]["kernel"])
    put_bn("bn1", p["bn1"], s["bn1"])
    for stage, blocks in enumerate(model.layers):
        for b in range(blocks):
            f = f"layer{stage + 1}_{b}"
            t = f"layer{stage + 1}.{b}"
            for c in (1, 2):
                put_conv(f"{t}.conv{c}", p[f][f"conv{c}"]["kernel"])
                put_bn(f"{t}.bn{c}", p[f][f"bn{c}"], s[f][f"bn{c}"])
            if "downsample_conv" in p[f]:
                put_conv(f"{t}.downsample.0", p[f]["downsample_conv"]["kernel"])
                put_bn(f"{t}.downsample.1", p[f]["downsample_bn"], s[f]["downsample_bn"])
    sd["fc.weight"] = np.asarray(p["fc"]["kernel"]).T
    sd["fc.bias"] = np.asarray(p["fc"]["bias"])

    ported = params_from_torch_state_dict(model, sd)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    a = model.apply(variables, x, train=False)
    b = model.apply({"params": ported["params"], "batch_stats": ported["batch_stats"]}, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    one_ch = ResNet(BasicBlock, (2, 2, 2, 2), num_classes=5, in_channels=1, compute_dtype="float32")
    ported1 = params_from_torch_state_dict(one_ch, sd)
    assert ported1["params"]["conv1"]["kernel"].shape == (7, 7, 1, 64)
    four_ch = ResNet(BasicBlock, (2, 2, 2, 2), num_classes=5, in_channels=4, compute_dtype="float32")
    assert params_from_torch_state_dict(four_ch, sd)["params"]["conv1"]["kernel"].shape == (7, 7, 4, 64)


def test_aggregation_and_fusion_models(rng):
    backbone = ResNet(BasicBlock, (1, 1, 1, 1), compute_dtype="float32")
    agg = AggregationModel(backbone, num_classes=2)
    bags = jnp.asarray(rng.rand(2, 3, 32, 32, 3), jnp.float32)
    v = agg.init(jax.random.key(0), bags, train=False)
    assert agg.apply(v, bags, train=False).shape == (2, 2)

    fus = FusionModel(backbone, rna_hidden_dims=(32, 16), num_classes=2)
    rna = jnp.asarray(rng.rand(2, 40), jnp.float32)
    vf = fus.init(jax.random.key(1), bags, rna, train=False)
    assert fus.apply(vf, bags, rna, train=False).shape == (2, 2)


def test_stratified_folds_and_f1():
    labels = np.array([0] * 20 + [1] * 30)
    folds = stratified_folds(labels, 5, seed=0)
    assert len(folds) == 5
    for train, val in folds:
        assert len(train) + len(val) == 50
        assert len(np.intersect1d(train, val)) == 0
        # each fold's val keeps the class ratio
        assert 2 <= np.sum(labels[val] == 0) <= 6
    # weighted f1 vs sklearn
    sk = pytest.importorskip("sklearn.metrics")
    y_true = np.array([0, 0, 1, 1, 1, 0, 1, 0])
    y_pred = np.array([0, 1, 1, 1, 0, 0, 1, 1])
    np.testing.assert_allclose(
        weighted_f1(y_true, y_pred, 2), sk.f1_score(y_true, y_pred, average="weighted"), atol=1e-9
    )


def test_tile_classifier_learns_separable_classes(rng):
    """Tiny CV experiment on linearly separable images: bright vs dark."""
    n = 40
    images = np.zeros((n, 32, 32, 3), np.float32)
    labels = (np.arange(n) % 2).astype(np.int64)
    images[labels == 0] = 0.85 + rng.rand(n // 2, 32, 32, 3).astype(np.float32) * 0.1
    images[labels == 1] = 0.05 + rng.rand(n // 2, 32, 32, 3).astype(np.float32) * 0.1

    cfg = MLConfig(num_epochs=3, batch_size=16, folds=2, image_size=32, lr=1e-3)
    model = ResNet(BasicBlock, (1, 1, 1, 1), num_classes=2, compute_dtype="float32")
    trainer = TileClassifierTrainer(cfg, model=model)
    state, res = trainer.fit(images[:32], labels[:32], images[32:], labels[32:])
    metrics = trainer.evaluate(images[32:], labels[32:], state)
    assert metrics["accuracy"] >= 0.75
    assert 0.0 <= metrics["weighted_f1"] <= 1.0


def test_tile_classifier_resident_path(rng):
    """fit_resident (HBM-resident uint8 set, scanned epochs) learns the same
    separable task, and predict_resident agrees with the host-feed predict
    on the identical state."""
    n = 40
    images = np.zeros((n, 32, 32, 3), np.uint8)
    labels = (np.arange(n) % 2).astype(np.int64)
    images[labels == 0] = 230 + (rng.rand(n // 2, 32, 32, 3) * 20).astype(np.uint8)
    images[labels == 1] = 10 + (rng.rand(n // 2, 32, 32, 3) * 20).astype(np.uint8)

    cfg = MLConfig(num_epochs=3, batch_size=16, folds=2, image_size=32, lr=1e-3)
    model = ResNet(BasicBlock, (1, 1, 1, 1), num_classes=2, compute_dtype="float32")
    trainer = TileClassifierTrainer(cfg, model=model)
    state, res = trainer.fit_resident(images[:32], labels[:32], images[32:], labels[32:])
    pred_res = trainer.predict_resident(images[32:], state)
    assert np.mean(pred_res == labels[32:]) >= 0.75
    pred_host = trainer.predict(images[32:].astype(np.float32) / 255.0, state)
    np.testing.assert_array_equal(pred_res, pred_host)
    assert res["best_val_acc"] >= 0.75
