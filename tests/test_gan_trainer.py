"""GAN trainer: every loss family runs a sharded jitted step, losses stay
finite, checkpoints round-trip, sample grids are written, RNA-GAN (wganvae)
path conditions on the frozen VAE, compat-GP mode exercises the reference's
two-step dynamics."""

import os

import jax
import numpy as np
import pytest

from rnagan_tpu.core.config import GANConfig, GANModelConfig, VAEModelConfig
from rnagan_tpu.data.tiles import Prefetcher, TileBatches, tiles_to_float
from rnagan_tpu.models.betavae import init_betavae
from rnagan_tpu.train.gan_trainer import GANTrainer

MODEL32 = GANModelConfig(encoding_dims=32, out_size=32, step_channels=8, compute_dtype="float32")
VAE_SMALL = VAEModelConfig(rna_features=20, z_dim=32, encoder_dims=(24, 32), decoder_dims=(24,))


def _tiles(n=32, size=32, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, size, size, 3) * 255).astype(np.uint8)


def _rna(n=32, genes=20, seed=1):
    return np.random.RandomState(seed).randn(n, genes).astype(np.float32)


def _run_steps(trainer, batches, n_epochs=1):
    state, results = trainer.fit(lambda e: batches.epoch(e), num_epochs=n_epochs)
    return state, results


@pytest.mark.parametrize("loss_type", ["wgan", "minimax", "lsgan"])
def test_unconditional_losses_run(loss_type):
    cfg = GANConfig(model=MODEL32, loss_type=loss_type, batch_size=16, sample_size=4)
    trainer = GANTrainer(cfg)
    batches = TileBatches(tiles_to_float(_tiles()), batch_size=16, pad_to=8)
    state, results = _run_steps(trainer, batches)
    h = results["history"][0]
    assert np.isfinite(h["d_loss"]) and np.isfinite(h["g_loss"])
    if loss_type == "wgan":
        assert "gp" in h and np.isfinite(h["gp"])
        # weight clipping applies at the START of each step (as the reference
        # does at wgan_loss.py:213-215), so post-step params may drift by the
        # optimizer updates of that step (2 Adam steps in compat terms)
        flat = jax.tree_util.tree_leaves(state.d_params)
        cfg_ = trainer.cfg
        assert max(float(np.abs(np.asarray(x)).max()) for x in flat) <= 0.01 + 3 * cfg_.d_lr


def test_wganvae_rna_gan_path():
    vae_vars = init_betavae(VAE_SMALL, jax.random.key(3))
    cfg = GANConfig(model=MODEL32, loss_type="wganvae", batch_size=16, sample_size=4, vae=VAE_SMALL)
    trainer = GANTrainer(cfg, vae_variables=vae_vars)
    batches = TileBatches(tiles_to_float(_tiles()), rna=_rna(), batch_size=16, pad_to=8)
    state, results = _run_steps(trainer, batches)
    h = results["history"][0]
    assert np.isfinite(h["d_loss"]) and np.isfinite(h["g_loss"]) and np.isfinite(h["gp"])
    # conditional generation from one patient's expression profile
    gene = jax.numpy.asarray(_rna(1))
    imgs = trainer.sample(state, jax.random.key(0), 6, gene=gene)
    assert imgs.shape == (6, 32, 32, 3)
    assert np.isfinite(imgs).all()


def test_n_critic_schedule():
    """n_critic=2: D updates every step, G only on every 2nd step (WGAN
    critic schedule, arXiv:1701.07875 alg. 1); g_loss metric is 0 on
    critic-only steps."""
    cfg = GANConfig(model=MODEL32, loss_type="wgan", batch_size=8, n_critic=2)
    trainer = GANTrainer(cfg)
    state = trainer.init_state()
    batch = {"image": tiles_to_float(_tiles(8))}
    g0 = jax.device_get(state.g_params)

    def changed(a, b):
        return any(not np.allclose(x, y) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    d0 = jax.device_get(state.d_params)
    state, m1 = trainer._train_step(state, batch, None)  # step 0: critic only
    g1, d1 = jax.device_get((state.g_params, state.d_params))
    assert not changed(g0, g1) and float(m1["g_loss"]) == 0.0
    assert changed(d0, d1)  # D updates every step
    state, m2 = trainer._train_step(state, batch, None)  # step 1: G updates
    g2 = jax.device_get(state.g_params)
    assert changed(g1, g2) and np.isfinite(m2["g_loss"])


def test_uint8_batch_ingest_matches_float():
    """A uint8 image batch (production streaming pipeline with emit_uint8)
    must produce the exact same step as the float batch: the trainer
    normalizes on device with the same x/127.5-1 map as tiles_to_float."""
    cfg = GANConfig(model=MODEL32, loss_type="lsgan", batch_size=16)
    raw = _tiles(16)
    outs = []
    for img in (raw, tiles_to_float(raw)):
        trainer = GANTrainer(cfg)
        state, m = trainer._train_step(trainer.init_state(), {"image": img}, None)
        outs.append((jax.device_get(state), jax.device_get(m)))
    for k in outs[0][1]:
        np.testing.assert_allclose(outs[0][1][k], outs[1][1][k], rtol=1e-6, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        outs[0][0].g_params, outs[1][0].g_params)


def test_generator_ema(tmp_path):
    """``GANConfig.g_ema_decay``: g_ema is the exact EMA of the G-update
    sequence (matches a manual recomputation), gates on the n_critic schedule,
    auto-selects at sampling, and round-trips through bundles — including
    seeding from an EMA-less bundle."""
    import jax.numpy as jnp

    decay, n_critic, steps = 0.5, 2, 4
    cfg = GANConfig(model=MODEL32, loss_type="wgan", batch_size=8, sample_size=4,
                    n_critic=n_critic, g_ema_decay=decay)
    trainer = GANTrainer(cfg)
    state = trainer.init_state()
    rng = np.random.RandomState(0)

    expected = jax.device_get(state.g_params)  # EMA seeds at init params
    for i in range(steps):
        batch = {"image": rng.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1}
        state, _ = trainer._train_step(state, batch, None)
        if i % n_critic == n_critic - 1:  # G updated this step
            new_p = jax.device_get(state.g_params)
            expected = jax.tree_util.tree_map(
                lambda e, p: e * decay + (1 - decay) * p, expected, new_p)
        else:  # G skipped: EMA must not drift
            pass
        jax.tree_util.tree_map(
            lambda e, a: np.testing.assert_allclose(e, np.asarray(a), rtol=1e-6, atol=1e-7),
            expected, jax.device_get(state.g_ema))

    # sampling auto-selects the EMA generator; use_ema=False forces raw
    key = jax.random.key(7)
    auto = trainer.sample(state, key, 2)
    raw = trainer.sample(state, key, 2, use_ema=False)
    ema_manual = trainer.generator.apply(
        {"params": jax.device_get(state.g_ema), "batch_stats": jax.device_get(state.g_stats)},
        jax.random.normal(key, (2, MODEL32.encoding_dims), jnp.float32), labels=None, train=False)
    np.testing.assert_allclose(auto, np.asarray(ema_manual), atol=1e-5)
    assert np.abs(auto - raw).max() > 1e-4  # EMA and raw weights genuinely differ

    # bundle round-trip preserves the EMA tree
    path = str(tmp_path / "ema.model")
    trainer.save_model(state, path)
    restored = GANTrainer(cfg).load_model(path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state.g_ema), jax.device_get(restored.g_ema))

    # an EMA-carrying bundle into an EMA-off trainer drops the tree...
    off = GANTrainer(GANConfig(model=MODEL32, loss_type="wgan", batch_size=8))
    st_off = off.load_model(path)
    assert st_off.g_ema is None
    with pytest.raises(ValueError):
        off.sample(st_off, key, 2, use_ema=True)
    # ...and an EMA-less bundle into an EMA-on trainer seeds EMA = params
    path2 = str(tmp_path / "plain.model")
    off.save_model(st_off, path2)
    seeded = GANTrainer(cfg).load_model(path2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(seeded.g_params), jax.device_get(seeded.g_ema))


def test_adam_mu_bfloat16_roundtrip(tmp_path):
    """``GANConfig.adam_mu_dtype="bfloat16"`` halves the first-moment HBM
    slice: mu leaves land in bf16 (nu stays f32 — its (1-b2)=1e-3 EMA
    increment is below bf16's mantissa), training stays finite, and both
    checkpoint formats (msgpack bundle, torchgan ``.model``) round-trip
    without a dtype flip (a flip would force an XLA recompile of the donated
    train step on the first post-restore step)."""
    import jax.numpy as jnp

    from rnagan_tpu.models.dcgan_torch import (
        _find_adam_state, export_torchgan_bundle, import_torchgan_bundle)

    cfg = GANConfig(model=MODEL32, loss_type="wgan", batch_size=16, sample_size=4,
                    adam_mu_dtype="bfloat16")
    model_dir = str(tmp_path / "models")
    trainer = GANTrainer(cfg, image_dir=str(tmp_path / "img"), model_dir=model_dir)
    batches = TileBatches(tiles_to_float(_tiles()), batch_size=16, pad_to=8)
    state, results = _run_steps(trainer, batches)
    h = results["history"][0]
    assert np.isfinite(h["d_loss"]) and np.isfinite(h["g_loss"])
    adam = _find_adam_state(jax.device_get(state.d_opt))
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree_util.tree_leaves(adam.mu))
    assert all(x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(adam.nu))

    # msgpack bundle round-trip preserves the moment dtype
    trainer2 = GANTrainer(cfg)
    restored = trainer2.load_model(os.path.join(model_dir, "gan_last.model"))
    r_adam = _find_adam_state(jax.device_get(restored.d_opt))
    assert all(np.asarray(x).dtype == jnp.bfloat16
               for x in jax.tree_util.tree_leaves(r_adam.mu))

    # torchgan .model hop: torch sees f32 moments; the import casts back to
    # the template's bf16. bf16 -> f32 -> bf16 is lossless, so values match
    # bit-exactly.
    path = str(tmp_path / "export.model")
    export_torchgan_bundle(path, cfg, jax.device_get(state), epoch=1)
    imported, _ = import_torchgan_bundle(path, cfg, trainer2.init_state())
    i_adam = _find_adam_state(imported.d_opt)
    i_leaves = jax.tree_util.tree_leaves(i_adam.mu)
    assert all(np.asarray(x).dtype == jnp.bfloat16 for x in i_leaves)
    for a, b in zip(jax.tree_util.tree_leaves(adam.mu), i_leaves):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_compat_reference_gp_mode():
    vae_vars = init_betavae(VAE_SMALL, jax.random.key(3))
    cfg = GANConfig(model=MODEL32, loss_type="wganvae", batch_size=16, sample_size=4,
                    vae=VAE_SMALL, compat_reference_gp=True)
    trainer = GANTrainer(cfg, vae_variables=vae_vars)
    batches = TileBatches(tiles_to_float(_tiles()), rna=_rna(), batch_size=16, pad_to=8)
    _, results = _run_steps(trainer, batches)
    assert np.isfinite(results["history"][0]["gp"])


def test_checkpoint_roundtrip_and_artifacts(tmp_path):
    cfg = GANConfig(model=MODEL32, loss_type="lsgan", batch_size=16, sample_size=4)
    image_dir = str(tmp_path / "images")
    model_dir = str(tmp_path / "models")
    trainer = GANTrainer(cfg, image_dir=image_dir, model_dir=model_dir)
    batches = TileBatches(tiles_to_float(_tiles()), batch_size=16, pad_to=8)
    state, _ = _run_steps(trainer, batches)
    assert os.path.exists(os.path.join(image_dir, "epoch_0.png"))
    ckpt = os.path.join(model_dir, "gan_last.model")
    assert os.path.exists(ckpt)

    trainer2 = GANTrainer(cfg)
    restored = trainer2.load_model(ckpt)
    assert int(restored.step) == int(state.step)
    a = trainer.sample(state, jax.random.key(5), 2)
    b = trainer2.sample(restored, jax.random.key(5), 2)
    np.testing.assert_allclose(a, b, atol=1e-5)
    # resume training from the restored bundle (note: fit donates its input
    # state buffers, so read anything needed from `restored` first)
    restored_step = int(restored.step)
    state3, _ = trainer2.fit(lambda e: batches.epoch(e), num_epochs=1, state=restored)
    assert int(state3.step) > restored_step


def test_conditional_gan_training():
    model = GANModelConfig(arch="condgan", encoding_dims=16, out_size=32, step_channels=8,
                           num_classes=2, compute_dtype="float32")
    cfg = GANConfig(model=model, loss_type="lsgan", batch_size=16, sample_size=4)
    trainer = GANTrainer(cfg)
    labels = np.arange(32) % 2
    batches = TileBatches(tiles_to_float(_tiles()), labels=labels, batch_size=16, pad_to=8)
    _, results = _run_steps(trainer, batches)
    assert np.isfinite(results["history"][0]["g_loss"])


def test_prefetcher_preserves_order_and_propagates_errors():
    items = list(range(20))
    assert list(Prefetcher(iter(items))) == items

    def bad():
        yield 1
        raise RuntimeError("boom")

    pf = Prefetcher(bad())
    assert next(pf) == 1
    with pytest.raises(RuntimeError):
        list(pf)


def test_prefetcher_transfer_runs_in_worker_thread():
    import threading

    seen_threads = []

    def transfer(x):
        seen_threads.append(threading.get_ident())
        return x * 10

    items = list(range(8))
    out = list(Prefetcher(iter(items), transfer=transfer))
    assert out == [x * 10 for x in items]
    # the whole point of the hook: transfer (e.g. jax.device_put) happens in
    # the prefetch thread so it overlaps the consumer's device compute
    assert set(seen_threads) and threading.get_ident() not in set(seen_threads)


def test_fit_eval_callback():
    cfg = GANConfig(model=MODEL32, loss_type="lsgan", batch_size=16, sample_size=4)
    trainer = GANTrainer(cfg)
    batches = TileBatches(tiles_to_float(_tiles()), batch_size=16, pad_to=8)
    seen = []

    def eval_fn(epoch, state, tr):
        imgs = tr.sample(state, jax.random.key(epoch), 2)
        seen.append(epoch)
        return {"probe_mean": float(np.mean(imgs))}

    _, results = trainer.fit(lambda e: batches.epoch(e), num_epochs=2,
                             eval_fn=eval_fn, eval_every=2)
    assert seen == [1]
    assert "probe_mean" in results["history"][1]
    assert "probe_mean" not in results["history"][0]


def test_fit_keeps_best_metric_state(tmp_path):
    """keep_best_metric retains the state at the best (lowest) probe value and
    writes gan_best.model — reference best-on-val pattern (betaVAE.py:270-273)
    applied to the GAN trainer per VERDICT r2 item 4."""
    cfg = GANConfig(model=MODEL32, loss_type="lsgan", batch_size=16, sample_size=4)
    trainer = GANTrainer(cfg, model_dir=str(tmp_path))
    batches = TileBatches(tiles_to_float(_tiles()), batch_size=16, pad_to=8)
    fake_fid = {0: 50.0, 1: 20.0, 2: 30.0}  # best at epoch 1, then regresses

    def eval_fn(epoch, state, tr):
        return {"fid": fake_fid[epoch]}

    final_state, results = trainer.fit(lambda e: batches.epoch(e), num_epochs=3,
                                       eval_fn=eval_fn, eval_every=1,
                                       keep_best_metric="fid")
    best = results["best"]
    assert best["epoch"] == 1 and best["fid"] == 20.0
    # retained state is the end-of-epoch-1 snapshot (2 steps/epoch at 32
    # tiles / batch 16), not the final state
    assert int(np.asarray(best["state"].step)) == 4
    assert int(np.asarray(best["state"].step)) < int(np.asarray(final_state.step))
    assert os.path.exists(tmp_path / "gan_best.model")
    loaded = trainer.load_model(str(tmp_path / "gan_best.model"))
    assert int(np.asarray(loaded.step)) == int(np.asarray(best["state"].step))


@pytest.mark.parametrize("batchnorm", [False, True])
def test_fused_critic_batch_equivalence(batchnorm):
    """Evaluating D on a vmapped [real; fake] group batch must reproduce the
    separate-pass step (same update, same metrics, same BN running stats) —
    the fused path is pure utilization. With batchnorm, per-group batch stats
    + the closed-form sequential running-stats recomposition make it exact
    (gan_trainer.d_loss_fn) — this is what lets the flagship batchnorm=True
    config run the fused critic (VERDICT r2 weak item 5)."""
    import jax
    import numpy as np

    from rnagan_tpu.core.config import GANConfig, GANModelConfig

    rng = np.random.RandomState(3)
    batch = {"image": rng.rand(6, 32, 32, 3).astype(np.float32) * 2 - 1}

    def make(fused):
        cfg = GANConfig(
            model=GANModelConfig(out_size=32, step_channels=8, encoding_dims=16,
                                 batchnorm=batchnorm, compute_dtype="float32"),
            loss_type="wgan", batch_size=6, fused_critic_batch=fused)
        return GANTrainer(cfg)

    # warm the critic away from init first: at init D(x) ~ 1e-5 (difference of
    # cancelling terms), where conv-tiling float noise flips metric signs and
    # equivalence can't be read; after a few steps outputs have real scale
    base = make(False)
    state0 = base.init_state()
    for _ in range(8):
        state0, _ = base._train_step(state0, batch, None)
    state0 = jax.device_get(state0)

    states, metrics = [], []
    for fused in (False, True):
        tr = make(fused)
        state, m = tr._train_step(jax.device_put(state0), batch, None)
        states.append(jax.device_get(state))
        metrics.append(jax.device_get(m))
    for k in metrics[0]:
        np.testing.assert_allclose(metrics[0][k], metrics[1][k], rtol=1e-4, atol=1e-6)
    for field in ("d_params", "g_params", "d_stats", "g_stats"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
            getattr(states[0], field), getattr(states[1], field))


@pytest.mark.parametrize("compat_gp", [False, True])
def test_projection_critic_trains(compat_gp):
    """critic='projection' (GANModelConfig.critic): the wganvae critic
    conditions on the frozen VAE embedding via Miyato-Koyama projection
    (arXiv:1802.05637) — the conditional-critic extension VERDICT r3 item 6
    asks to test against the identity-transfer negative. Both GP modes must
    run: fused per-sample GP and the reference's separate-step dynamics."""
    model = GANModelConfig(encoding_dims=32, out_size=32, step_channels=8,
                           compute_dtype="float32", critic="projection")
    vae_vars = init_betavae(VAE_SMALL, jax.random.key(3))
    cfg = GANConfig(model=model, loss_type="wganvae", batch_size=16,
                    sample_size=4, vae=VAE_SMALL, compat_reference_gp=compat_gp)
    trainer = GANTrainer(cfg, vae_variables=vae_vars)
    batches = TileBatches(tiles_to_float(_tiles()), rna=_rna(), batch_size=16, pad_to=8)
    state, results = _run_steps(trainer, batches)
    h = results["history"][0]
    assert np.isfinite(h["d_loss"]) and np.isfinite(h["g_loss"]) and np.isfinite(h["gp"])
    # the conditioning path owns parameters and they must move
    assert "cond_proj" in state.d_params
    proj0 = trainer.init_state().d_params["cond_proj"]["kernel"]
    assert not np.allclose(np.asarray(proj0), np.asarray(state.d_params["cond_proj"]["kernel"]))


def test_projection_critic_score_depends_on_cond():
    """Same image, different embedding -> different critic score (and the
    unconditional config has no cond_proj parameters at all)."""
    from rnagan_tpu.models.dcgan import init_gan, make_discriminator

    model = GANModelConfig(encoding_dims=32, out_size=32, step_channels=8,
                           compute_dtype="float32", critic="projection")
    _, dv = init_gan(model, jax.random.key(0), batch=4)
    disc = make_discriminator(model)
    x = jax.numpy.asarray(np.random.RandomState(0).randn(4, 32, 32, 3), jax.numpy.float32)
    c1 = jax.numpy.asarray(np.random.RandomState(1).randn(4, 32), jax.numpy.float32)
    c2 = jax.numpy.asarray(np.random.RandomState(2).randn(4, 32), jax.numpy.float32)
    s1 = disc.apply(dv, x, train=False, cond=c1)
    s2 = disc.apply(dv, x, train=False, cond=c2)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))

    uncond = GANModelConfig(encoding_dims=32, out_size=32, step_channels=8,
                            compute_dtype="float32")
    _, dv_u = init_gan(uncond, jax.random.key(0), batch=4)
    assert "cond_proj" not in dv_u["params"]


def test_projection_critic_requires_wganvae():
    model = GANModelConfig(encoding_dims=32, out_size=32, step_channels=8,
                           critic="projection")
    with pytest.raises(ValueError, match="wganvae"):
        GANTrainer(GANConfig(model=model, loss_type="wgan"))


def test_explicit_batch_rng_overrides_seed_stream():
    """A batch carrying an explicit 'rng' key drives the step's noise
    instead of the cfg.seed-derived stream — so the compiled program is
    seed-free (multi-seed studies cache-hit) and two trainers with
    different cfg.seed produce IDENTICAL steps from identical state+rng."""
    batch = {"image": tiles_to_float(_tiles(16)),
             "rng": jax.random.key(123)}
    trainers = [GANTrainer(GANConfig(model=MODEL32, loss_type="wgan",
                                     batch_size=16, seed=s)) for s in (7, 8)]
    state0 = jax.device_get(trainers[0].init_state())  # shared init
    outs = []
    for tr in trainers:
        st, m = tr._train_step(jax.device_put(state0), dict(batch), None)
        outs.append((jax.device_get(st), jax.device_get(m)))
    for k in outs[0][1]:
        np.testing.assert_array_equal(outs[0][1][k], outs[1][1][k])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        outs[0][0].g_params, outs[1][0].g_params)
    # and WITHOUT rng the two seeds diverge (internal stream used)
    del batch["rng"]
    ms = []
    for tr in trainers:
        _, m = tr._train_step(jax.device_put(state0), dict(batch), None)
        ms.append(float(jax.device_get(m["d_loss"])))
    assert ms[0] != ms[1]
