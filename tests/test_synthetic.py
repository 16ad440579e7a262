"""Synthetic histology corpus: determinism, value ranges, morphology <->
expression coupling (the property that makes RNA-infusion informative)."""

import jax
import jax.numpy as jnp
import numpy as np

from rnagan_tpu.data.synthetic import (LATENT, SyntheticCorpus, render_batch,
                                       render_tile, sample_slides)


def test_render_tile_shape_range_determinism():
    key = jax.random.key(0)
    s = jnp.zeros((LATENT,))
    a = np.asarray(render_tile(key, s, 64, 32))
    b = np.asarray(render_tile(key, s, 64, 32))
    assert a.shape == (64, 64, 3) and a.dtype == np.float32
    assert a.min() >= -1.0 and a.max() <= 1.0
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render_tile(jax.random.fold_in(key, 1), s, 64, 32))
    assert not np.allclose(a, c)


def test_latent_changes_morphology():
    """Nuclei density latent must visibly change tile statistics."""
    key = jax.random.key(1)
    sparse = jnp.zeros((LATENT,)).at[0].set(-3.0)
    dense = jnp.zeros((LATENT,)).at[0].set(3.0)
    t_sparse = np.asarray(render_tile(key, sparse, 64, 48))
    t_dense = np.asarray(render_tile(key, dense, 64, 48))
    # nuclei are dark: dense slides have lower mean luminance
    assert t_dense.mean() < t_sparse.mean() - 0.05


def test_corpus_batches_and_expression_coupling():
    corpus = SyntheticCorpus(n_slides=12, tiles_per_slide=10, n_genes=64,
                             size=32, seed=0, n_tissues=2)
    assert corpus.expression.shape == (12, 64)
    expr = np.asarray(corpus.expression)
    assert expr.min() >= 0.0 and (expr == 0).mean() > 0.02  # zero-inflated

    sl, ti = corpus.batch_ids(jax.random.key(3), 8)
    imgs = np.asarray(corpus.render(sl, ti))
    assert imgs.shape == (8, 32, 32, 3)

    # same (slide, tile) renders identically; different tile of same slide differs
    again = np.asarray(corpus.render(sl, ti))
    np.testing.assert_array_equal(imgs, again)
    other = np.asarray(corpus.render(sl, ti + 1))
    assert not np.allclose(imgs, other)

    # morphology <-> expression coupling: slides close in expression space are
    # close in latent space (the map is linear in s), hence similar tiles
    tissue = np.asarray(corpus.slides.tissue)
    log_expr = np.log1p(expr)
    d_within, d_across = [], []
    for i in range(12):
        for j in range(i + 1, 12):
            d = np.linalg.norm(log_expr[i] - log_expr[j])
            (d_within if tissue[i] == tissue[j] else d_across).append(d)
    assert np.mean(d_within) < np.mean(d_across), "tissues must cluster in expression"


def test_real_tiles_disjoint_from_training_ids():
    corpus = SyntheticCorpus(n_slides=4, tiles_per_slide=6, n_genes=16, size=32, seed=1)
    real = corpus.real_tiles(8)
    assert real.shape == (8, 32, 32, 3)
    assert real.min() >= 0.0 and real.max() <= 1.0

    # the RNG-key ids of held-out tiles must not collide with ANY slide's
    # training-tile ids (a plain tiles_per_slide stride aliases held-out
    # index tps+k of slide s onto training tile k of slide s+1)
    import numpy as np

    tps, span, stride = corpus.tiles_per_slide, corpus.HELDOUT_SPAN, corpus.id_stride
    train_ids = {int(t + s * stride) for s in range(corpus.n_slides) for t in range(tps)}
    held_ids = {int(tps + k + s * stride)
                for s in range(corpus.n_slides) for k in range(span)}
    assert not (train_ids & held_ids)
