"""Eval layer: generation protocol, latent interpolation analysis, expression
sampling, per-patient representations."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
from rnagan_tpu.data.rna import Scaler
from rnagan_tpu.data.tiles import TileBatches, tiles_to_float
from rnagan_tpu.eval.generate import compare_real_vs_synthetic, generate_images, generate_patient_grid, unnormalize
from rnagan_tpu.eval.interpolate import class_difference_vectors, encode_means, interpolation_report
from rnagan_tpu.eval.sample import sample_expression
from rnagan_tpu.models.betavae import BetaVAE, init_betavae
from rnagan_tpu.train.gan_trainer import GANTrainer

VAE_SMALL = VAEModelConfig(rna_features=20, z_dim=16, encoder_dims=(24, 16), decoder_dims=(24,))
MODEL32 = GANModelConfig(encoding_dims=16, out_size=32, step_channels=8, compute_dtype="float32")


@pytest.fixture(scope="module")
def vae():
    variables = init_betavae(VAE_SMALL, jax.random.key(0))
    return BetaVAE(VAE_SMALL), variables


@pytest.fixture(scope="module")
def trainers():
    vae_vars = init_betavae(VAE_SMALL, jax.random.key(0))
    rna_cfg = GANConfig(model=MODEL32, loss_type="wganvae", batch_size=8, vae=VAE_SMALL)
    gan_cfg = GANConfig(model=MODEL32, loss_type="wgan", batch_size=8)
    rna_tr = GANTrainer(rna_cfg, vae_variables=vae_vars)
    gan_tr = GANTrainer(gan_cfg)
    return (rna_tr, rna_tr.init_state()), (gan_tr, gan_tr.init_state())


def test_generate_images_range_and_reference_cancellation(trainers, rng):
    (rna_tr, rna_state), _ = trainers
    gene = rng.randn(1, 20).astype(np.float32)
    imgs = generate_images(rna_tr, rna_state, 5, jax.random.key(1), gene=gene)
    assert imgs.shape == (5, 32, 32, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # discovered reference property (gan_utils.py:211-216): per-batch
    # standardization cancels a broadcast single-patient z_mean, so default
    # generation is patient-independent — parity behavior we reproduce exactly
    imgs2 = generate_images(rna_tr, rna_state, 5, jax.random.key(1), gene=gene + 3.0)
    np.testing.assert_allclose(imgs, imgs2, atol=1e-4)
    # per-row distinct genes (training-style batch): conditioning survives
    genes = rng.randn(5, 20).astype(np.float32)
    a = rna_tr.sample(rna_state, jax.random.key(2), 5, gene=jax.numpy.asarray(genes))
    b = rna_tr.sample(rna_state, jax.random.key(2), 5, gene=jax.numpy.asarray(genes[::-1].copy()))
    assert not np.allclose(a, b)


def test_population_stats_conditioning(trainers, rng):
    """The conditioning-preserving mode: z population stats keep the patient
    signal at generation time."""
    from rnagan_tpu.losses.rna_infusion import z_population_stats

    (rna_tr, rna_state), _ = trainers
    pop = z_population_stats(rna_tr.vae, rna_tr.vae_variables, rng.randn(64, 20).astype(np.float32))
    gene = rng.randn(1, 20).astype(np.float32)
    a = rna_tr.sample(rna_state, jax.random.key(1), 5, gene=jax.numpy.asarray(gene), z_pop=pop)
    b = rna_tr.sample(rna_state, jax.random.key(1), 5, gene=jax.numpy.asarray(gene + 3.0), z_pop=pop)
    assert not np.allclose(a, b)  # patients distinguishable
    assert np.isfinite(a).all()


def test_generate_images_population_mode(trainers, rng):
    """condition_mode='population' threads trainer.z_pop through generation:
    patients distinguishable, and an unset z_pop is a loud error."""
    (rna_tr, rna_state), _ = trainers
    gene = rng.randn(1, 20).astype(np.float32)
    rna_tr.z_pop = None
    with pytest.raises(ValueError, match="z_pop"):
        generate_images(rna_tr, rna_state, 4, jax.random.key(1), gene=gene,
                        condition_mode="population")
    rna_tr.set_z_population(rng.randn(64, 20).astype(np.float32))
    a = generate_images(rna_tr, rna_state, 4, jax.random.key(1), gene=gene,
                        condition_mode="population")
    b = generate_images(rna_tr, rna_state, 4, jax.random.key(1), gene=gene + 3.0,
                        condition_mode="population")
    assert a.shape == (4, 32, 32, 3) and a.min() >= 0.0 and a.max() <= 1.0
    assert not np.allclose(a, b)  # conditioning survives (vs the reference-mode cancellation)
    rna_tr.z_pop = None  # don't leak into other module-scoped-fixture tests


def test_patient_grid_and_comparison(trainers, tmp_path, rng):
    (rna_tr, rna_state), (gan_tr, gan_state) = trainers
    gene = rng.randn(1, 20).astype(np.float32)
    grid_path = str(tmp_path / "grid.png")
    imgs = generate_patient_grid(rna_tr, rna_state, gene, jax.random.key(2), grid_path, sample_size=8)
    assert os.path.exists(grid_path) and imgs.shape[0] == 8
    real = tiles_to_float((rng.rand(8, 32, 32, 3) * 255).astype(np.uint8))
    out = compare_real_vs_synthetic(
        rna_tr, rna_state, gan_tr, gan_state, real, gene, jax.random.key(3),
        str(tmp_path / "cmp"), sample_size=8,
    )
    assert all(os.path.exists(str(tmp_path / "cmp" / f"patient_{s}.png")) for s in ("real", "rnagan", "gan"))
    assert all(a.shape == (8, 32, 32, 3) for a in out)


def test_interpolation_report(vae, rng):
    model, variables = vae
    # two synthetic "tissues" with distinct expression signatures
    a = rng.randn(20, 20).astype(np.float32) + 2
    b = rng.randn(20, 20).astype(np.float32) - 2
    data = np.concatenate([a, b])
    labels = np.array([0] * 20 + [1] * 20)
    z = encode_means(model, variables, data, batch_size=16)
    assert z.shape == (40, 16)
    diffs = class_difference_vectors(z, labels)
    assert set(diffs) == {(0, 1), (1, 0)}
    np.testing.assert_allclose(diffs[(0, 1)], -diffs[(1, 0)], atol=1e-6)
    # distinct classes produce a nonzero direction
    assert np.linalg.norm(diffs[(0, 1)]) > 0.01
    report = interpolation_report(model, variables, data, labels, alpha=0.5)
    assert report["recons"][(0, 1)].shape == (20, 20)


def test_sample_expression_inverse_transform(vae, rng):
    model, variables = vae
    scaler = Scaler.fit(rng.gamma(2, 10, size=(50, 20)), "standard")
    expr = sample_expression(model, variables, scaler, 6, jax.random.key(4))
    assert expr.shape == (6, 20)
    # interpolation offset shifts the decoded distribution
    direction = np.ones(16, np.float32) * 2
    expr2 = sample_expression(model, variables, scaler, 6, jax.random.key(4), interpolation=direction)
    assert not np.allclose(expr, expr2)


def test_representations(trainers, rng):
    from rnagan_tpu.eval.fid import InceptionExtractor
    from rnagan_tpu.eval.representation import compute_representations

    (rna_tr, rna_state), (gan_tr, gan_state) = trainers
    extractor = InceptionExtractor(dtype=jnp.float32)
    tiles = {p: tiles_to_float((rng.rand(4, 32, 32, 3) * 255).astype(np.uint8)) for p in ("p1", "p2")}
    genes = {p: rng.randn(1, 20).astype(np.float32) for p in ("p1", "p2")}
    reps = compute_representations(
        ["p1", "p2"], lambda p: tiles[p], lambda p: genes[p],
        rna_tr, rna_state, gan_tr, gan_state,
        key=jax.random.key(5), tiles_per_patient=4, extractor=extractor,
    )
    assert reps["real"].shape == (2, 2048)
    assert reps["rnagan"].shape == (2, 2048)
    assert np.isfinite(reps["gan"]).all()


def test_distance_statistics_identity_vs_chance(rng):
    """Conditioned fakes (fake_i ~ real_i) must score frac_own_patient_closest
    = 1.0 with a positive margin; an unconditional control (every fake drawn
    from one shared distribution) must land near chance = 1/P. All statistics
    must be finite (regression: an eye()*inf mask NaN-poisoned the
    off-diagonal median)."""
    from rnagan_tpu.eval.representation import distance_statistics

    P, D = 16, 32
    real = rng.randn(P, D).astype(np.float64)
    conditioned = real + 0.01 * rng.randn(P, D)
    unconditional = np.tile(real.mean(0), (P, 1)) + 0.01 * rng.randn(P, D)
    labels = np.arange(P) % 2

    s = distance_statistics(real, conditioned, labels=labels)
    assert s["frac_own_patient_closest"] == 1.0
    assert s["mean_margin_vs_median_other"] > 0.5
    assert s["frac_nearest_same_label"] == 1.0
    assert all(np.isfinite(v) for v in s.values())

    u = distance_statistics(real, unconditional, labels=labels)
    assert u["frac_own_patient_closest"] <= 0.25  # chance is 1/16
    assert abs(u["mean_margin_vs_median_other"]) < 0.2
    assert all(np.isfinite(v) for v in u.values())


def test_unnormalize_roundtrip(rng):
    x = rng.rand(3, 4, 4, 3).astype(np.float32)
    np.testing.assert_allclose(unnormalize(x * 2 - 1), x, atol=1e-6)
