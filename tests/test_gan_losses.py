"""GAN loss math: closed-form gradient penalty, wasserstein/minimax/lsgan
golden values vs torch formulas, RNA infusion semantics (torch unbiased std)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnagan_tpu.losses import gan as G
from rnagan_tpu.losses.rna_infusion import infused_noise, standardize_batch


def test_wasserstein_losses_golden(rng):
    dx = jnp.asarray(rng.randn(8))
    dgz = jnp.asarray(rng.randn(8))
    np.testing.assert_allclose(float(G.wasserstein_generator_loss(dgz)), -float(np.mean(dgz)), rtol=1e-6)
    np.testing.assert_allclose(
        float(G.wasserstein_discriminator_loss(dx, dgz)), float(np.mean(dgz) - np.mean(dx)), rtol=1e-6
    )


def test_gradient_penalty_closed_form(rng):
    """Linear critic D(x) = <w, x>: grad wrt x is w everywhere, so
    per-sample GP = (||w|| - 1)^2 and the reference's global-norm quirk gives
    (sqrt(N)*||w|| - 1)^2 (reference wgan_loss.py:43)."""
    w = rng.randn(6, 6, 3).astype(np.float32)
    wj = jnp.asarray(w)
    x = jnp.asarray(rng.randn(4, 6, 6, 3).astype(np.float32))

    def critic(x):
        return jnp.sum(x * wj[None], axis=(1, 2, 3))

    wnorm = np.linalg.norm(w.ravel())
    gp_ps = float(G.gradient_penalty(critic, x, per_sample=True))
    np.testing.assert_allclose(gp_ps, (wnorm - 1.0) ** 2, rtol=1e-4)
    gp_gl = float(G.gradient_penalty(critic, x, per_sample=False))
    np.testing.assert_allclose(gp_gl, (np.sqrt(4) * wnorm - 1.0) ** 2, rtol=1e-4)


def test_gradient_penalty_differentiable_wrt_params(rng):
    """The GP term must admit grad-of-grad (the double backward the torch
    reference builds with create_graph=True, wgan_loss.py:34-41)."""
    x = jnp.asarray(rng.randn(4, 5).astype(np.float32))

    def penalty(w):
        def critic(x):
            return jnp.tanh(x @ w).sum(axis=1)

        return G.gradient_penalty(critic, x, per_sample=True)

    g = jax.grad(penalty)(jnp.asarray(rng.randn(5, 3).astype(np.float32)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_minimax_lsgan_vs_torch(rng):
    torch = pytest.importorskip("torch")
    dx = rng.randn(8).astype(np.float32)
    dgz = rng.randn(8).astype(np.float32)
    tdx, tdgz = torch.tensor(dx), torch.tensor(dgz)
    # non-saturating minimax G loss: -log sigmoid(dgz) == softplus(-dgz)
    ref_g = torch.nn.functional.softplus(-tdgz).mean().item()
    np.testing.assert_allclose(float(G.minimax_generator_loss(jnp.asarray(dgz))), ref_g, rtol=1e-5)
    ref_d = (torch.nn.functional.softplus(-tdx) + torch.nn.functional.softplus(tdgz)).mean().item()
    got_d = float(G.minimax_discriminator_loss(jnp.asarray(dx), jnp.asarray(dgz)))
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-5)
    np.testing.assert_allclose(
        float(G.least_squares_generator_loss(jnp.asarray(dgz))), 0.5 * float(np.mean((dgz - 1) ** 2)), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(G.least_squares_discriminator_loss(jnp.asarray(dx), jnp.asarray(dgz))),
        0.5 * float(np.mean((dx - 1) ** 2) + np.mean(dgz**2)),
        rtol=1e-5,
    )


def test_clip_params():
    tree = {"w": jnp.asarray([-0.5, 0.005, 0.5])}
    clipped = G.clip_params(tree, -0.01, 0.01)
    np.testing.assert_allclose(np.asarray(clipped["w"]), [-0.01, 0.005, 0.01])


def test_standardize_batch_matches_torch_unbiased_std(rng):
    torch = pytest.importorskip("torch")
    x = rng.randn(8, 5).astype(np.float32) * 2 + 3
    tx = torch.tensor(x)
    ref = ((tx - tx.mean(dim=0)) / tx.std(dim=0)).numpy()  # torch std: ddof=1
    got = np.asarray(standardize_batch(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_infused_noise_stats(rng):
    z_mean = jnp.asarray(rng.randn(16, 8).astype(np.float32) * 5)
    noise = infused_noise(jax.random.key(0), z_mean, 0.3)
    got = np.asarray(noise)
    np.testing.assert_allclose(got.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(got.std(axis=0, ddof=1), 1.0, atol=1e-4)
    # infusion dominates: columns ordered by z_mean stay correlated
    corr = np.corrcoef(np.asarray(z_mean)[:, 0], got[:, 0])[0, 1]
    assert corr > 0.9
