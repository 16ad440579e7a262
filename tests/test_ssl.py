"""SimCLR SSL trainer: NT-Xent math, augmentation contracts, training smoke,
backbone handoff to the downstream classifier."""

import jax
import jax.numpy as jnp
import numpy as np

from rnagan_tpu.core.config import MeshConfig
from rnagan_tpu.models.resnet import BasicBlock, ResNet
from rnagan_tpu.train.ssl_trainer import (
    SimCLRTrainer,
    SSLConfig,
    augment_views,
    nt_xent_loss,
    _random_resized_crop,
)


def test_nt_xent_perfect_alignment(rng):
    """Distinct samples with identical views: positives are the most similar
    pairs -> accuracy 1 and loss near its floor."""
    feats = jnp.asarray(rng.randn(8, 16).astype(np.float32) * 3)
    z = jnp.concatenate([feats, feats], axis=0)
    loss, acc = nt_xent_loss(z, temperature=0.5)
    assert float(acc) == 1.0
    # shuffled views break alignment
    z_bad = jnp.concatenate([feats, feats[::-1]], axis=0)
    loss_bad, acc_bad = nt_xent_loss(z_bad, 0.5)
    assert float(loss) < float(loss_bad)
    assert float(acc_bad) < 1.0


def test_random_resized_crop_properties(rng):
    x = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    out = _random_resized_crop(jax.random.key(0), x, scale_min=0.6)
    assert out.shape == x.shape
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    # scale 1.0 (scale_min=1) reproduces the input
    ident = _random_resized_crop(jax.random.key(1), x, scale_min=1.0)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(x), atol=1e-5)


def test_augment_views_stochastic(rng):
    x = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    a = augment_views(jax.random.key(0), x, 0.6)
    b = augment_views(jax.random.key(1), x, 0.6)
    assert a.shape == x.shape
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) <= 1.0


def test_simclr_training_smoke_and_handoff(rng):
    backbone = ResNet(BasicBlock, (1, 1, 1, 1), compute_dtype="float32")
    cfg = SSLConfig(batch_size=16, num_epochs=2, image_size=16, lr=1e-3,
                    projection_hidden=32, projection_dim=16)
    trainer = SimCLRTrainer(cfg, backbone=backbone)
    images = rng.rand(32, 16, 16, 3).astype(np.float32)
    state, results = trainer.fit(images)
    assert np.isfinite(results["history"][-1]["loss"])

    bv = trainer.backbone_variables(state)
    assert "conv1" in bv["params"]

    # downstream classifier accepts the pretrained backbone
    from rnagan_tpu.train.ml_experiment import MLConfig, TileClassifierTrainer

    ml_cfg = MLConfig(num_epochs=1, batch_size=16, image_size=16, folds=2)
    clf = TileClassifierTrainer(
        ml_cfg,
        model=ResNet(BasicBlock, (1, 1, 1, 1), num_classes=2, compute_dtype="float32"),
        backbone_variables=bv,
    )
    st = clf.init_state()
    np.testing.assert_allclose(
        np.asarray(st.params["conv1"]["kernel"]), np.asarray(bv["params"]["conv1"]["kernel"])
    )
