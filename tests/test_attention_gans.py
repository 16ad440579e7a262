"""SAGAN / BigGAN attention families (reference ``histopathology_gan.py:
211-244`` registers both but imports missing modules — SURVEY.md 2.5; built
as models/sagan.py + models/biggan.py): shapes, spectral-norm power iteration
against true singular values, attention gating, conditional/unconditional
BigGAN, full trainer steps, bundle round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnagan_tpu.core.config import GANConfig, GANModelConfig
from rnagan_tpu.data.tiles import TileBatches, tiles_to_float
from rnagan_tpu.models.biggan import BigGANGenerator, split_latent
from rnagan_tpu.models.dcgan import init_gan, make_discriminator, make_generator
from rnagan_tpu.train.gan_trainer import GANTrainer

SAGAN16 = GANModelConfig(arch="sagan", encoding_dims=16, out_size=16, step_channels=4,
                         attn_size=8, compute_dtype="float32")
BIGGAN16 = GANModelConfig(arch="biggan", encoding_dims=24, out_size=16, step_channels=4,
                          num_classes=2, attn_size=8, embed_dim=6, compute_dtype="float32")


def _tiles(n=16, size=16, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, size, size, 3) * 255).astype(np.uint8)


def _named_leaves(tree):
    """[(\"a/b/c\", leaf), ...] for easy name matching."""
    return [(jax.tree_util.keystr(path, simple=True, separator="/"), leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree)]


def test_registry_builds_attention_archs():
    for cfg in (SAGAN16, BIGGAN16):
        g, d = make_generator(cfg), make_discriminator(cfg)
        assert type(g).__name__.lower().startswith(cfg.arch)
        assert type(d).__name__.lower().startswith(cfg.arch)


@pytest.mark.parametrize("cfg", [SAGAN16, BIGGAN16], ids=["sagan", "biggan"])
def test_forward_shapes_and_attention_placement(cfg):
    gv, dv = init_gan(cfg, jax.random.key(0), batch=2)
    g, d = make_generator(cfg), make_discriminator(cfg)
    z = jax.random.normal(jax.random.key(1), (2, cfg.encoding_dims))
    labels = jnp.array([0, 1]) if cfg.num_classes else None
    imgs = g.apply(gv, z, labels=labels, train=False)
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all() and np.abs(np.asarray(imgs)).max() <= 1.0
    scores = d.apply(dv, imgs, labels=labels, train=False)
    assert scores.shape == (2,) and np.isfinite(np.asarray(scores)).all()
    # one attention block at attn_size=8 in each net, gamma gated to 0 at init
    for vars_ in (gv, dv):
        named = _named_leaves(vars_["params"])
        assert any("Attention_8" in n for n, _ in named), "attention block missing"
        gammas = [v for n, v in named if "Attention_8" in n and n.endswith("gamma")]
        assert gammas and all(float(np.asarray(v)) == 0.0 for v in gammas)
    # spectral-norm state lives in batch_stats (power-iteration u + sigma)
    stats_names = [n for n, _ in _named_leaves(dv["batch_stats"])]
    assert any(n.endswith("sigma") for n in stats_names)
    assert any(n.endswith("/u") for n in stats_names)


def test_attention_absent_when_size_unmatched():
    cfg = GANModelConfig(arch="sagan", encoding_dims=16, out_size=16, step_channels=4,
                         attn_size=64, compute_dtype="float32")
    gv, _ = init_gan(cfg, jax.random.key(0), batch=2)
    assert not any("Attention" in n for n, _ in _named_leaves(gv["params"]))


def test_spectral_norm_tracks_true_singular_value():
    """After repeated update_stats forwards, the stored sigma for each conv
    kernel approximates the true top singular value of the (reshaped) kernel
    — the power iteration genuinely converges, it is not dead state."""
    cfg = SAGAN16
    d = make_discriminator(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    variables = d.init(jax.random.key(1), x, train=False)
    stats = variables["batch_stats"]
    for _ in range(30):
        _, upd = d.apply({"params": variables["params"], "batch_stats": stats},
                         x, train=True, mutable=["batch_stats"])
        stats = upd["batch_stats"]

    kernel = np.asarray(variables["params"]["Conv_1"]["kernel"])
    true_sigma = np.linalg.svd(kernel.reshape(-1, kernel.shape[-1]),
                               compute_uv=False)[0]
    sigma_leaf = [v for n, v in _named_leaves(stats["sn_Conv_1"]) if n.endswith("sigma")]
    assert sigma_leaf, "no sigma tracked"
    np.testing.assert_allclose(float(np.asarray(sigma_leaf[0])), true_sigma, rtol=0.05)


def test_biggan_latent_split_covers_any_dim():
    z = jnp.arange(2 * 2048, dtype=jnp.float32).reshape(2, 2048)
    chunks = split_latent(z, 7)  # 2048 % 7 != 0 — the reference's dim_z
    assert sum(c.shape[-1] for c in chunks) == 2048
    assert max(c.shape[-1] for c in chunks) - min(c.shape[-1] for c in chunks) <= 1
    np.testing.assert_array_equal(np.concatenate([np.asarray(c) for c in chunks], -1),
                                  np.asarray(z))


def test_biggan_conditional_bn_starts_as_plain_bn():
    """Zero-init CBN projections: at init the class/chunk conditioning is an
    exact no-op (scale 1, shift 0), so different labels give identical outputs
    through CBN until training moves the projections."""
    g = BigGANGenerator(BIGGAN16)
    z = jax.random.normal(jax.random.key(0), (2, 24))
    gv = g.init(jax.random.key(1), z, labels=jnp.array([0, 1]), train=False)
    out_a = g.apply(gv, z, labels=jnp.array([0, 0]), train=False)
    out_b = g.apply(gv, z, labels=jnp.array([1, 1]), train=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_biggan_unconditional_mode():
    """num_classes=0: no embedding params, labels ignored — the wganvae
    composition path."""
    cfg = GANModelConfig(arch="biggan", encoding_dims=24, out_size=16, step_channels=4,
                         num_classes=0, attn_size=8, compute_dtype="float32")
    gv, dv = init_gan(cfg, jax.random.key(0), batch=2)
    assert not any("shared_embed" in n for n, _ in _named_leaves(gv["params"]))
    g = make_generator(cfg)
    imgs = g.apply(gv, jax.random.normal(jax.random.key(2), (2, 24)), train=False)
    assert imgs.shape == (2, 16, 16, 3)
    d = make_discriminator(cfg)
    scores = d.apply(dv, imgs, train=False)
    assert scores.shape == (2,)


def test_sagan_trains_wgan():
    cfg = GANConfig(model=SAGAN16, loss_type="wgan", batch_size=8, sample_size=4, clip=None)
    trainer = GANTrainer(cfg)
    batches = TileBatches(tiles_to_float(_tiles()), batch_size=8, pad_to=8)
    state, results = trainer.fit(lambda e: batches.epoch(e), num_epochs=1)
    h = results["history"][0]
    assert np.isfinite(h["d_loss"]) and np.isfinite(h["g_loss"]) and np.isfinite(h["gp"])
    imgs = trainer.sample(state, jax.random.key(5), 4)
    assert imgs.shape == (4, 16, 16, 3) and np.isfinite(imgs).all()


def test_biggan_trains_conditional_and_roundtrips(tmp_path):
    cfg = GANConfig(model=BIGGAN16, loss_type="wgan", batch_size=8, sample_size=4, clip=None)
    trainer = GANTrainer(cfg)
    labels = np.arange(16) % 2
    batches = TileBatches(tiles_to_float(_tiles()), labels=labels, batch_size=8, pad_to=8)
    state, results = trainer.fit(lambda e: batches.epoch(e), num_epochs=1)
    h = results["history"][0]
    assert np.isfinite(h["d_loss"]) and np.isfinite(h["g_loss"])
    # params actually moved (incl. through attention and CBN projections)
    init = trainer.init_state()
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        init.g_params, jax.device_get(state.g_params))
    assert max(jax.tree_util.tree_leaves(moved)) > 1e-6
    imgs = trainer.sample(state, jax.random.key(5), 4)
    assert imgs.shape == (4, 16, 16, 3) and np.isfinite(imgs).all()
    path = str(tmp_path / "biggan.model")
    trainer.save_model(state, path)
    restored = GANTrainer(cfg).load_model(path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state.g_params), jax.device_get(restored.g_params))


def test_biggan_remat_is_bit_exact():
    """remat=True must change only the compute schedule, never the math:
    one full wgan train step (D + GP double-backward + G) produces identical
    losses and identical updated params with and without rematerialization
    (the HBM workaround for the b32 TPU-worker crash,
    docs/perf/biggan_rootcause.json). Also covers the eval-mode (train=False
    static arg) path through nn.remat."""
    states, metrics = [], []
    imgs = tiles_to_float(_tiles(8))
    for remat in (False, True):
        model = GANModelConfig(arch="biggan", encoding_dims=24, out_size=16,
                               step_channels=4, attn_size=8,
                               compute_dtype="float32", remat=remat)
        cfg = GANConfig(model=model, loss_type="wgan", batch_size=8, clip=None)
        trainer = GANTrainer(cfg)
        state = trainer.init_state()
        batch = {"image": jnp.asarray(imgs), "rng": jax.random.key(3)}
        state, m = trainer._train_step(state, batch, None)
        states.append(jax.device_get(state))
        metrics.append({k: float(v) for k, v in m.items()})
        g = trainer.generator.apply(
            {"params": state.g_params, "batch_stats": state.g_stats},
            jnp.zeros((2, 24)), labels=None, train=False)
        assert np.isfinite(np.asarray(g)).all()
    assert metrics[0] == metrics[1]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        states[0].g_params, states[1].g_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        states[0].d_params, states[1].d_params)


def test_fused_critic_batch_rejected_for_sn_archs():
    with pytest.raises(ValueError, match="spectral-norm"):
        GANTrainer(GANConfig(model=SAGAN16, loss_type="wgan", batch_size=8,
                             fused_critic_batch=True))
