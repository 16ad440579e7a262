"""Pallas fused Adam over flat parameter slabs — the VERDICT r3 item-5
training-path kernel attempt, built to answer one question with a
measurement: *can a hand kernel beat XLA's optimizer fusion?*

The stage profile (docs/perf/logs/profile_b8.log, tools/step_profile.py)
isolates the Adam updates for G+D (156.5M params) at ~5.5 ms/step. Adam's
memory contract is fixed: read params, grads, mu, nu and write params, mu,
nu — 7 array passes, 7 x 626 MB = 4.38 GB/step, which at 5.5 ms is
~795 GB/s: the v5e HBM roofline. If XLA is at the roofline, no kernel can
be faster; if its per-leaf fusions leave launch/scheduling gaps, one big
Pallas kernel over a flat slab recovers them. ``tools/adam_bench.py`` runs
the A/B on the real chip and commits the answer either way.

The kernel itself: grid over row-blocks of a (rows, 128) view of the flat
buffer; each block does the full Adam element math on the VPU between one
HBM read and one write per array; params/mu/nu update in place via
``input_output_aliases`` (same buffers, zero extra allocation — exactly the
donated-step semantics the trainer already uses). The 1-b^t bias
corrections are computed outside the kernel and passed as SMEM scalars
(Mosaic cannot legalize a traced-exponent powf). Math matches
``optax.adam`` bit-for-bit in f32
(tests/test_ops.py::test_fused_adam_matches_optax).

Reference counterpart: torch.optim.Adam inside every loss's ``train_ops``
(reference ``wgan_loss.py:127,261,388``) — there the optimizer is cuDNN/ATen
fused per tensor; here the comparison target is XLA's fusion of
``optax.adam``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
#: rows per grid block: 1024 x 128 f32 = 512 KB per array; 7 block arrays
#: (4 in + 3 out) x 2 for the pipeline's double buffering = 7 MB of VMEM,
#: comfortably inside the 16 MB scoped budget (2048-row blocks measured
#: 16.79 MB on v5e — over the limit) while each DMA stays large enough to
#: stream at full HBM bandwidth.
BLOCK_ROWS = 1024


def _adam_kernel(corr_ref, p_ref, g_ref, mu_ref, nu_ref,
                 p_out, mu_out, nu_out, *, lr, b1, b2, eps):
    g = g_ref[...]
    mu = b1 * mu_ref[...] + (1.0 - b1) * g
    nu = b2 * nu_ref[...] + (1.0 - b2) * g * g
    # optax bias correction 1 - b^t is computed OUTSIDE the kernel (Mosaic
    # cannot legalize math.powf with a traced exponent) and arrives as two
    # SMEM scalars — same jnp.power as optax, so parity is preserved.
    c1 = corr_ref[0]
    c2 = corr_ref[1]
    update = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
    p_out[...] = p_ref[...] - lr * update
    mu_out[...] = mu
    nu_out[...] = nu


@functools.partial(jax.jit, static_argnames=("lr", "b1", "b2", "eps"))
def adam_update_flat(
    p: jax.Array, g: jax.Array, mu: jax.Array, nu: jax.Array, step: jax.Array,
    *, lr: float = 1e-4, b1: float = 0.5, b2: float = 0.999, eps: float = 1e-8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One Adam step on flat f32 buffers (p, g, mu, nu all shape (n,)).

    ``step`` is the 0-based step counter (as ``GANTrainState.step``); the
    bias correction uses t = step + 1, matching ``optax.adam``. Buffers whose
    length is not a multiple of 128*BLOCK_ROWS are zero-padded for the call
    and sliced back — pad lanes compute garbage that is discarded.
    Returns (new_p, new_mu, new_nu); inputs are donated in place.
    """
    n = p.shape[0]
    block = LANE * BLOCK_ROWS
    n_pad = -n % block
    if n_pad:
        pad = lambda x: jnp.concatenate([x, jnp.zeros((n_pad,), x.dtype)])
        p, g, mu, nu = pad(p), pad(g), pad(mu), pad(nu)
    rows = (n + n_pad) // LANE
    shape2 = (rows, LANE)
    p2, g2, mu2, nu2 = (x.reshape(shape2) for x in (p, g, mu, nu))
    t = (step + 1).astype(jnp.float32)
    corr = jnp.stack([1.0 - jnp.power(jnp.float32(b1), t),
                      1.0 - jnp.power(jnp.float32(b2), t)])

    grid = rows // BLOCK_ROWS
    bspec = pl.BlockSpec((BLOCK_ROWS, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(shape2, jnp.float32)
    kernel = functools.partial(_adam_kernel, lr=lr, b1=b1, b2=b2, eps=eps)
    new_p, new_mu, new_nu = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [bspec] * 4,
        out_specs=(bspec, bspec, bspec),
        out_shape=(out_shape, out_shape, out_shape),
        # in-place: p, mu, nu outputs alias their inputs (args: corr,p,g,mu,nu)
        input_output_aliases={1: 0, 3: 1, 4: 2},
    )(corr, p2, g2, mu2, nu2)
    unflat = lambda x: x.reshape(-1)[:n]
    return unflat(new_p), unflat(new_mu), unflat(new_nu)
