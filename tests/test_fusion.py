"""Fusion trainer: masked backbone freezing, bag+RNA training loop."""

import jax
import numpy as np

from rnagan_tpu.data.patches import BagData
from rnagan_tpu.models.resnet import BasicBlock, ResNet
from rnagan_tpu.train.fusion_trainer import FusionConfig, FusionTrainer, _trainable_mask


def _bags(rng, n=8, bag=2, size=32, genes=12):
    bags = rng.randint(0, 255, (n, bag, size, size, 3), dtype=np.uint8)
    labels = (np.arange(n) % 2).astype(np.int32)
    # make classes separable: class 1 bags are dark
    bags[labels == 1] = bags[labels == 1] // 4
    slide_idx = np.arange(n, dtype=np.int32) % 4
    rna = rng.randn(4, genes).astype(np.float32)
    return BagData(bags, labels, slide_idx, [f"S{i}" for i in range(4)], rna)


def test_trainable_mask_freezes_early_stages():
    params = {
        "conv1": {"kernel": 0}, "bn1": {"scale": 0},
        "layer1_0": {"conv1": {"kernel": 0}},
        "layer3_0": {"conv1": {"kernel": 0}},
        "fc": {"kernel": 0},
    }
    mask = _trainable_mask(params, True)
    assert mask["conv1"]["kernel"] is False
    assert mask["layer1_0"]["conv1"]["kernel"] is False
    assert mask["layer3_0"]["conv1"]["kernel"] is True
    assert mask["fc"]["kernel"] is True


def test_fusion_trainer_runs_and_freezes(rng):
    backbone = ResNet(BasicBlock, (1, 1, 1, 1), num_classes=2, compute_dtype="float32")
    cfg = FusionConfig(num_classes=2, batch_size=8, num_epochs=2, lr=1e-3,
                       rna_hidden_dims=(16, 8))
    trainer = FusionTrainer(cfg, backbone=backbone)
    bags = _bags(rng)
    state0 = trainer.init_state(bags.bags.shape[1:], bags.rna.shape[1])
    frozen_before = np.asarray(state0.params["backbone"]["conv1"]["kernel"]).copy()
    head_before = np.asarray(state0.params["head"]["kernel"]).copy()
    state, results = trainer.fit(bags, state=state0)
    assert np.isfinite(results["history"][-1]["loss"])
    # frozen stage unchanged, head trained
    np.testing.assert_array_equal(np.asarray(state.params["backbone"]["conv1"]["kernel"]), frozen_before)
    assert not np.allclose(np.asarray(state.params["head"]["kernel"]), head_before)
    preds = trainer.predict(bags, state)
    assert preds.shape == (8,)
