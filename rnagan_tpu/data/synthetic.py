"""Procedural synthetic histology: an on-device, reference-scale stand-in for
GTEx WSI tiles + matched expression.

The reference trains on GTEx tissue tiles with per-patient RNA-seq
(reference ``README.md:28-60``; brain 246 / lung 562 slides x <=600 tiles,
19,198 genes). Neither GTEx images nor expression are downloadable in this
environment, so quality validation (FID-vs-epoch, the RNA-GAN 24-vs-39-epoch
claim, ``README.md:62-81``) runs on this generator instead. Design goals:

* **H&E-like structure**: eosin-pink stroma texture, hematoxylin-purple
  nuclei with variable density/radius/elongation, white lumen/vesicles —
  enough spatial statistics that a DCGAN has something non-trivial to learn.
* **Morphology <-> expression coupling**: each slide has a latent vector
  ``s`` that drives BOTH tile appearance and its expression profile, so
  RNA-infusion (the wganvae mechanism, reference ``wgan_loss.py:97-106``)
  carries real information about the tiles — the property behind the
  reference's fewer-epochs-to-quality claim.
* **TPU-native**: tiles render *on device* inside jitted programs (static
  shapes, ``lax.scan`` over nuclei, no data-dependent control flow), so a
  whole training epoch — render + train step — compiles into one XLA program
  with zero host I/O. The reference's equivalent (LMDB decode at batch 8 on 4
  CPU workers, ``read_data.py:248-253``) is the slowest part of its loop.

Nothing here is used by the production data path; it is the validation
corpus + a throughput-friendly demo input.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SlideParams(NamedTuple):
    """Per-slide latents (all shaped (n_slides, ...))."""

    s: jax.Array          # (n, LATENT) morphology/expression latent
    tissue: jax.Array     # (n,) int32 tissue id


LATENT = 8


def sample_slides(key: jax.Array, n_slides: int, n_tissues: int = 2) -> SlideParams:
    """Slide latents: a per-tissue mean + per-slide scatter, so tissues form
    separated clusters in morphology AND expression (as GTEx tissues do)."""
    k1, k2, k3 = jax.random.split(key, 3)
    tissue = jnp.arange(n_slides, dtype=jnp.int32) % n_tissues
    centers = jax.random.normal(k1, (n_tissues, LATENT)) * 1.2
    s = centers[tissue] + 0.45 * jax.random.normal(k2, (n_slides, LATENT))
    del k3
    return SlideParams(s=s, tissue=tissue)


# ------------------------------------------------------------------ rendering
def _soft_disc(yy, xx, cy, cx, ry, rx, theta, sharp=1.5):
    """Soft elliptical blob mask in [0,1]."""
    ct, st = jnp.cos(theta), jnp.sin(theta)
    dy, dx = yy - cy, xx - cx
    u = (ct * dx + st * dy) / rx
    v = (-st * dx + ct * dy) / ry
    d = u * u + v * v
    return jax.nn.sigmoid((1.0 - d) * sharp * 4.0)


@partial(jax.jit, static_argnums=(2, 3))
def render_tile(key: jax.Array, s: jax.Array, size: int = 256, max_nuclei: int = 96) -> jax.Array:
    """One H&E-like tile from slide latent ``s``: float32 (size, size, 3) in
    [-1, 1] (the trainer's image range). Deterministic in (key, s)."""
    ks = jax.random.split(key, 8)
    sig = jax.nn.sigmoid

    density = 0.25 + 0.7 * sig(s[0])          # fraction of max_nuclei present
    radius = (3.0 + 4.0 * sig(s[1])) * size / 64.0
    hema = 0.35 + 0.5 * sig(s[2])             # purple intensity of nuclei
    tex_scale = 1.0 + 3.0 * sig(s[3])         # stroma texture frequency
    lumen_amt = 0.6 * sig(s[4])               # white lumen coverage
    elong = 1.0 + 1.5 * sig(s[5])             # nuclear elongation
    eosin = 0.55 + 0.4 * sig(s[6])            # stroma pinkness
    chroma_noise = 0.02 + 0.05 * sig(s[7])

    yy, xx = jnp.mgrid[0:size, 0:size].astype(jnp.float32)

    # stroma: a few random-phase plane waves -> smooth eosin texture
    kf = jax.random.uniform(ks[0], (6, 2), minval=-1.0, maxval=1.0) * tex_scale * 2 * jnp.pi / size
    ph = jax.random.uniform(ks[1], (6,), maxval=2 * jnp.pi)
    waves = jnp.sin(kf[:, 0, None, None] * yy + kf[:, 1, None, None] * xx + ph[:, None, None])
    stroma = 0.5 + 0.5 * jnp.tanh(waves.mean(0) * 2.0)          # (S, S) in [0,1]

    # nuclei: union of soft ellipses, scanned to keep memory O(size^2)
    centers = jax.random.uniform(ks[2], (max_nuclei, 2), maxval=float(size))
    present = (jax.random.uniform(ks[3], (max_nuclei,)) < density).astype(jnp.float32)
    radii = radius * jax.random.uniform(ks[4], (max_nuclei,), minval=0.65, maxval=1.35)
    thetas = jax.random.uniform(ks[5], (max_nuclei,), maxval=jnp.pi)

    def add_nucleus(clear, inp):
        (cy, cx), p, r, th = inp
        m = _soft_disc(yy, xx, cy, cx, r, r * elong, th) * p
        return clear * (1.0 - m), None

    clear, _ = jax.lax.scan(add_nucleus, jnp.ones((size, size)),
                            (centers, present, radii, thetas))
    nuclei = 1.0 - clear                                          # (S, S) in [0,1]

    # lumen: few big white blobs
    lcenters = jax.random.uniform(ks[6], (4, 2), maxval=float(size))
    lpresent = (jax.random.uniform(ks[7], (4,)) < lumen_amt).astype(jnp.float32)

    def add_lumen(clear, inp):
        (cy, cx), p = inp
        m = _soft_disc(yy, xx, cy, cx, size * 0.11, size * 0.14, 0.3) * p
        return clear * (1.0 - m), None

    lclear, _ = jax.lax.scan(add_lumen, jnp.ones((size, size)), (lcenters, lpresent))
    lumen = 1.0 - lclear

    # composite: white background -> eosin stroma -> hematoxylin nuclei -> lumen
    white = jnp.ones((size, size, 3))
    stroma_rgb = jnp.stack([0.92 - 0.10 * stroma,
                            0.60 - 0.18 * stroma * eosin,
                            0.75 - 0.08 * stroma], -1)
    nuc_rgb = jnp.stack([0.30 * (1 - hema) + 0.22,
                         0.16 + 0.08 * (1 - hema),
                         0.45 + 0.25 * hema], -1)
    img = stroma_rgb
    img = img * (1 - nuclei[..., None]) + nuc_rgb[None, None, :] * nuclei[..., None]
    img = img * (1 - lumen[..., None]) + white * 0.97 * lumen[..., None]
    noise = chroma_noise * jax.random.normal(jax.random.fold_in(key, 99), (size, size, 3))
    img = jnp.clip(img + noise, 0.0, 1.0)
    return img * 2.0 - 1.0


@partial(jax.jit, static_argnums=(3, 4))
def render_batch(key: jax.Array, slide_s: jax.Array, tile_ids: jax.Array,
                 size: int = 256, max_nuclei: int = 96) -> jax.Array:
    """Render a batch of tiles: ``slide_s`` (B, LATENT) latents, ``tile_ids``
    (B,) int32 *globally unique* tile ids (callers pass
    ``tile + slide * tiles_per_slide``, so tile i of a slide is deterministic
    — the corpus is addressable like a tile store, not a stream)."""
    keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(tile_ids)
    return jax.vmap(lambda k, s: render_tile(k, s, size, max_nuclei))(keys, slide_s)


# ----------------------------------------------------------------- expression
def make_gene_map(key: jax.Array, n_genes: int = 19198) -> dict:
    """Fixed (seeded) linear map latent -> log-expression + per-gene dropout
    propensity, shared by the whole corpus."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    W = jax.random.normal(k1, (LATENT, n_genes)) * 0.8
    # ~70% of genes ignore the latent (housekeeping): sparse signature
    mask = (jax.random.uniform(k2, (n_genes,)) < 0.3).astype(jnp.float32)
    base = jax.random.normal(k3, (n_genes,)) * 1.0 + 3.0
    zero_p = jax.random.uniform(k4, (n_genes,), maxval=0.35)
    return {"W": W * mask, "base": base, "zero_p": zero_p}


@jax.jit
def expression_from_slides(key: jax.Array, slide_s: jax.Array, gene_map: dict) -> jax.Array:
    """(n_slides, n_genes) nonnegative counts with zero-inflation — the GTEx
    CSV shape the data layer expects (log-transform + standardize downstream,
    reference ``read_data.py:467-495``)."""
    n, g = slide_s.shape[0], gene_map["base"].shape[0]
    k1, k2 = jax.random.split(key)
    log_mu = gene_map["base"] + slide_s @ gene_map["W"] + 0.25 * jax.random.normal(k1, (n, g))
    expr = jnp.expm1(jnp.maximum(log_mu, 0.0))
    zeros = jax.random.uniform(k2, (n, g)) < gene_map["zero_p"]
    return jnp.where(zeros, 0.0, expr)


class SyntheticCorpus:
    """Reference-scale corpus facade: slides, expression CSV values, and
    on-device batch rendering for training + held-out 'real' tiles for FID."""

    #: extra per-slide tile-id range reserved for held-out (FID "real") tiles;
    #: per-slide id stride is tiles_per_slide + HELDOUT_SPAN so a held-out
    #: index can never alias another slide's training-tile RNG key
    HELDOUT_SPAN = 64

    def __init__(self, n_slides: int = 200, tiles_per_slide: int = 150,
                 n_genes: int = 19198, size: int = 256, seed: int = 0,
                 n_tissues: int = 2):
        self.n_slides, self.tiles_per_slide, self.size = n_slides, tiles_per_slide, size
        self.id_stride = tiles_per_slide + self.HELDOUT_SPAN
        key = jax.random.key(seed)
        self.slides = sample_slides(jax.random.fold_in(key, 0), n_slides, n_tissues)
        self.gene_map = make_gene_map(jax.random.fold_in(key, 1), n_genes)
        self.expression = expression_from_slides(
            jax.random.fold_in(key, 2), self.slides.s, self.gene_map)
        self._render_key = jax.random.fold_in(key, 3)

    def batch_ids(self, step_key: jax.Array, batch: int):
        """Uniform (slide, tile) sampling — jittable."""
        k1, k2 = jax.random.split(step_key)
        sl = jax.random.randint(k1, (batch,), 0, self.n_slides)
        ti = jax.random.randint(k2, (batch,), 0, self.tiles_per_slide)
        return sl, ti

    def render(self, slide_ids: jax.Array, tile_ids: jax.Array):
        """(B, size, size, 3) float32 in [-1, 1], deterministic per
        (slide, tile). Tile indices in [0, tiles_per_slide) are the training
        corpus; [tiles_per_slide, tiles_per_slide + HELDOUT_SPAN) are held-out
        — the per-slide ``id_stride`` keeps every (slide, tile) RNG key
        globally unique, so held-out tiles share no random draws with ANY
        training tile (a plain tiles_per_slide stride would alias a held-out
        index onto the next slide's training keys)."""
        return render_batch(self._render_key, self.slides.s[slide_ids],
                            tile_ids + slide_ids * self.id_stride, self.size)

    def real_tiles(self, n: int, *, offset: int = 0, seed: int = 7) -> np.ndarray:
        """Held-out 'real' set for FID: round-robin slides, tile indices past
        the training range. Returns float [0, 1] NHWC on host."""
        rng = np.random.RandomState(seed)
        sl = jnp.asarray(rng.randint(0, self.n_slides, n), jnp.int32)
        ti = jnp.asarray(self.tiles_per_slide + offset + np.arange(n) % self.HELDOUT_SPAN,
                         jnp.int32)
        out = []
        for i in range(0, n, 64):
            out.append(np.asarray(self.render(sl[i:i + 64], ti[i:i + 64])))
        return (np.concatenate(out)[:n] + 1.0) * 0.5
