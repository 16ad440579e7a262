"""Torch/torchgan checkpoint interop for the DCGAN family.

The reference's GAN checkpoints are torchgan ``Trainer`` ``.model`` bundles:
``torch.save`` of a dict holding ``epoch``, per-model state_dicts
(``generator`` / ``discriminator``) and per-model Adam optimizer state_dicts
(``optimizer_generator`` / ``optimizer_discriminator``), written to
``checkpoints=model_dir`` (reference ``histopathology_gan.py:298-302``) and
consumed by ``trainer.load_model`` (``histopathology_gan.py:311-312``,
``gan_utils.py:297``).

torchgan's DCGANGenerator/DCGANDiscriminator are ``nn.Sequential`` stacks of
``nn.Sequential(conv, [bn], nonlinearity)`` blocks, so their state_dict keys
are ``model.<block>.<idx>.<param>`` with ``.0`` the conv and ``.1`` the
BatchNorm. Our flax modules (models/dcgan.py) use the same channel schedule,
which makes the mapping mechanical:

* generator block b: ``ConvTranspose_b.kernel`` <-> ``model.b.0.weight``,
  ``_BN_b`` <-> ``model.b.1.*`` (head + ``r`` up-blocks carry BN; the final
  ConvTranspose has a bias instead);
* discriminator block b: ``Conv_b.kernel`` <-> ``model.b.0.weight`` (the
  first and last convs carry biases; middle blocks b in 1..r carry
  ``_BN_{b-1}`` <-> ``model.b.1.*``).

Tensor layout conversions:

* ``nn.ConvTranspose2d`` weights are (in, out, kH, kW) and torch's transposed
  conv places the *unflipped* kernel, while ``lax.conv_transpose`` convolves
  with the spatially flipped one — so ConvT kernels flip both spatial axes in
  transit (same identity as ``eval/serving.head_weight_matrix``);
* ``nn.Conv2d`` weights are OIHW, flax is HWIO — pure transpose, no flip
  (both are cross-correlations);
* BatchNorm: flax ``scale``/``bias`` + ``batch_stats`` <-> torch ``weight``/
  ``bias``/``running_mean``/``running_var`` (+ ``num_batches_tracked``).

Adam state maps moment-for-moment: optax ``ScaleByAdamState.mu/nu`` are the
same bias-uncorrected EMAs as torch Adam's ``exp_avg``/``exp_avg_sq`` (both
apply the bias correction at update time), reshaped with the same layout
transforms as their parameters and keyed by torch's ``model.parameters()``
ordering.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from rnagan_tpu.core.config import GANModelConfig


def _num_repeats(size: int) -> int:
    return size.bit_length() - 4


def convt_kernel_to_torch(k: np.ndarray) -> np.ndarray:
    """flax ConvTranspose HWIO -> torch ConvTranspose2d (in, out, kH, kW),
    flipping both spatial axes (lax.conv_transpose convolves with the flipped
    kernel; torch places it unflipped)."""
    k = np.asarray(k)
    return np.ascontiguousarray(k[::-1, ::-1].transpose(2, 3, 0, 1))


def convt_kernel_from_torch(w: np.ndarray) -> np.ndarray:
    w = np.asarray(w)
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def conv_kernel_to_torch(k: np.ndarray) -> np.ndarray:
    """flax Conv HWIO -> torch Conv2d OIHW (both cross-correlate: no flip)."""
    return np.ascontiguousarray(np.asarray(k).transpose(3, 2, 0, 1))


def conv_kernel_from_torch(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _gen_layout(cfg: GANModelConfig):
    """[(flax_conv_name, torch_block, kind, bn_name|None)] for the generator."""
    if cfg.arch != "dcgan":
        raise ValueError(
            f"torchgan .model interop covers the reference's DCGAN family; arch={cfg.arch!r} "
            "has no torchgan counterpart (the reference never wires dcgan_up, and condgan "
            "head shapes depend on num_classes)")
    r = _num_repeats(cfg.out_size)
    layout = []
    for b in range(r + 1):  # head + r up-blocks, BN'd when cfg.batchnorm
        bn = f"_BN_{b}" if cfg.batchnorm else None
        layout.append((f"ConvTranspose_{b}", b, "convt", bn))
    layout.append((f"ConvTranspose_{r + 1}", r + 1, "convt", None))
    return layout


def _disc_layout(cfg: GANModelConfig):
    r = _num_repeats(cfg.out_size)
    layout = [("Conv_0", 0, "conv", None)]
    for b in range(1, r + 1):
        bn = f"_BN_{b - 1}" if cfg.batchnorm else None
        layout.append((f"Conv_{b}", b, "conv", bn))
    layout.append((f"Conv_{r + 1}", r + 1, "conv", None))
    return layout


def _to_state_dict(layout, params, stats) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for fname, block, kind, bn in layout:
        leaf = params[fname]
        to_torch = convt_kernel_to_torch if kind == "convt" else conv_kernel_to_torch
        sd[f"model.{block}.0.weight"] = to_torch(leaf["kernel"])
        if "bias" in leaf:
            sd[f"model.{block}.0.bias"] = np.asarray(leaf["bias"])
        if bn is not None:
            bp = params[bn]["BatchNorm_0"]
            bs = stats[bn]["BatchNorm_0"]
            sd[f"model.{block}.1.weight"] = np.asarray(bp["scale"])
            sd[f"model.{block}.1.bias"] = np.asarray(bp["bias"])
            sd[f"model.{block}.1.running_mean"] = np.asarray(bs["mean"])
            sd[f"model.{block}.1.running_var"] = np.asarray(bs["var"])
            sd[f"model.{block}.1.num_batches_tracked"] = np.asarray(0, np.int64)
    return sd


def _from_state_dict(layout, sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for fname, block, kind, bn in layout:
        from_torch = convt_kernel_from_torch if kind == "convt" else conv_kernel_from_torch
        leaf = {"kernel": from_torch(sd[f"model.{block}.0.weight"])}
        if f"model.{block}.0.bias" in sd:
            leaf["bias"] = np.asarray(sd[f"model.{block}.0.bias"], np.float32)
        params[fname] = leaf
        if bn is not None:
            params[bn] = {"BatchNorm_0": {
                "scale": np.asarray(sd[f"model.{block}.1.weight"], np.float32),
                "bias": np.asarray(sd[f"model.{block}.1.bias"], np.float32),
            }}
            stats[bn] = {"BatchNorm_0": {
                "mean": np.asarray(sd[f"model.{block}.1.running_mean"], np.float32),
                "var": np.asarray(sd[f"model.{block}.1.running_var"], np.float32),
            }}
    return params, stats


def generator_state_dict(cfg: GANModelConfig, params, stats) -> Dict[str, np.ndarray]:
    return _to_state_dict(_gen_layout(cfg), params, stats)


def generator_from_state_dict(cfg: GANModelConfig, sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    return _from_state_dict(_gen_layout(cfg), sd)


def discriminator_state_dict(cfg: GANModelConfig, params, stats) -> Dict[str, np.ndarray]:
    return _to_state_dict(_disc_layout(cfg), params, stats)


def discriminator_from_state_dict(cfg: GANModelConfig, sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    return _from_state_dict(_disc_layout(cfg), sd)


def _param_order(layout, params):
    """(flax_path, transform_kind) in torch ``model.parameters()`` order:
    per block — conv.weight, [conv.bias], [bn.weight, bn.bias]."""
    order = []
    for fname, _block, kind, bn in layout:
        order.append(((fname, "kernel"), kind))
        if "bias" in params[fname]:
            order.append(((fname, "bias"), "vec"))
        if bn is not None:
            order.append(((bn, "BatchNorm_0", "scale"), "vec"))
            order.append(((bn, "BatchNorm_0", "bias"), "vec"))
    return order


def _tree_get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _tree_set(tree, path, val):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = val


_TO_TORCH = {"convt": convt_kernel_to_torch, "conv": conv_kernel_to_torch,
             "vec": lambda x: np.asarray(x)}
_FROM_TORCH = {"convt": convt_kernel_from_torch, "conv": conv_kernel_from_torch,
               "vec": lambda x: np.asarray(x, np.float32)}


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState (count, mu, nu) inside an optax chain."""
    import optax

    leaves = opt_state if isinstance(opt_state, (tuple, list)) else (opt_state,)
    for item in leaves:
        if isinstance(item, optax.ScaleByAdamState):
            return item
        if isinstance(item, (tuple, list)):
            found = _find_adam_state(item)
            if found is not None:
                return found
    return None


def adam_state_dict(layout, params, opt_state, *, lr: float, betas=(0.5, 0.999),
                    eps: float = 1e-8) -> Dict[str, Any]:
    """optax adam state -> torch ``optim.Adam.state_dict()`` layout."""
    adam = _find_adam_state(opt_state)
    order = _param_order(layout, params)
    state = {}
    for i, (path, kind) in enumerate(order):
        conv = _TO_TORCH[kind]
        state[i] = {
            "step": int(np.asarray(adam.count)),
            # torch Adam moments match the (f32) param dtype; up-cast here so a
            # bf16 mu (GANConfig.adam_mu_dtype) exports as a valid torch bundle
            "exp_avg": conv(np.asarray(_tree_get(adam.mu, path), np.float32)),
            "exp_avg_sq": conv(np.asarray(_tree_get(adam.nu, path), np.float32)),
        }
    group = {"lr": lr, "betas": tuple(betas), "eps": eps, "weight_decay": 0,
             "amsgrad": False, "maximize": False, "foreach": None,
             "capturable": False, "differentiable": False, "fused": None,
             "params": list(range(len(order)))}
    return {"state": state, "param_groups": [group]}


def adam_state_from_dict(layout, params, template_opt_state, sd) -> Any:
    """torch Adam state_dict -> optax adam state shaped like ``template``."""
    import jax
    import optax

    adam = _find_adam_state(template_opt_state)
    order = _param_order(layout, params)
    # tree_map rebuilds fresh (mutable) dicts shaped like the template
    mu = jax.tree_util.tree_map(np.asarray, adam.mu)
    nu = jax.tree_util.tree_map(np.asarray, adam.nu)
    step = 0
    for i, (path, kind) in enumerate(order):
        entry = sd["state"].get(i, sd["state"].get(str(i)))
        if entry is None:
            # torch Adam state is lazily populated: a param that never saw a
            # gradient (or a bundle saved pre-first-step) has no entry — its
            # moments stay at the template zeros
            continue
        conv = _FROM_TORCH[kind]
        step = int(np.asarray(entry["step"]))
        # cast to the template leaf dtype (mu may be bf16 under
        # GANConfig.adam_mu_dtype; a dtype flip here would force an XLA
        # recompile of the donated train step on the first post-restore step)
        _tree_set(mu, path, conv(entry["exp_avg"]).astype(_tree_get(mu, path).dtype))
        _tree_set(nu, path, conv(entry["exp_avg_sq"]).astype(_tree_get(nu, path).dtype))
    new_adam = optax.ScaleByAdamState(count=np.asarray(step, np.int32), mu=mu, nu=nu)

    def replace(node):
        if isinstance(node, optax.ScaleByAdamState):
            return new_adam
        if isinstance(node, tuple):
            vals = [replace(x) for x in node]
            return type(node)(*vals) if hasattr(node, "_fields") else tuple(vals)
        if isinstance(node, list):
            return [replace(x) for x in node]
        return node

    return replace(template_opt_state)


def export_torchgan_bundle(path: str, cfg, state, *, epoch: int = 0,
                           loss_information: Optional[Dict[str, Any]] = None) -> None:
    """Write a torchgan-``Trainer``-layout ``.model`` bundle with torch.save
    (reference ``histopathology_gan.py:298-302``; loaded at ``gan_utils.py:297``).

    ``cfg`` is the GANConfig (for model shape + TTUR lrs); ``state`` a
    GANTrainState. Loss/metric *objects* are torchgan-class pickles we cannot
    (and should not) fabricate — they are stored as empty containers, which
    restores G/D/optimizers for generation and resume-with-fresh-losses."""
    import torch

    m = cfg.model
    def t(v):  # copy: jax-backed arrays are non-writable, torch wants owned memory
        return torch.from_numpy(np.array(v)) if getattr(v, "ndim", 0) else torch.tensor(v)

    gen_sd = {k: t(v) for k, v in generator_state_dict(m, state.g_params, state.g_stats).items()}
    disc_sd = {k: t(v) for k, v in discriminator_state_dict(m, state.d_params, state.d_stats).items()}

    def tensorize_opt(sd):
        for entry in sd["state"].values():
            entry["exp_avg"] = torch.from_numpy(np.array(entry["exp_avg"]))
            entry["exp_avg_sq"] = torch.from_numpy(np.array(entry["exp_avg_sq"]))
            entry["step"] = torch.tensor(float(entry["step"]))
        return sd

    g_opt = tensorize_opt(adam_state_dict(_gen_layout(m), state.g_params, state.g_opt,
                                          lr=cfg.g_lr, betas=(cfg.adam_b1, cfg.adam_b2)))
    d_opt = tensorize_opt(adam_state_dict(_disc_layout(m), state.d_params, state.d_opt,
                                          lr=cfg.d_lr, betas=(cfg.adam_b1, cfg.adam_b2)))
    bundle = {
        "epoch": int(epoch) + 1,
        "loss_information": dict(loss_information or {}),
        "loss_objects": {},
        "metric_objects": {},
        "loss_logs": {},
        "metric_logs": {},
        "generator": gen_sd,
        "discriminator": disc_sd,
        "optimizer_generator": g_opt,
        "optimizer_discriminator": d_opt,
    }
    torch.save(bundle, path)


def import_torchgan_bundle(path: str, cfg, template_state):
    """Read a torchgan ``.model`` bundle into a GANTrainState shaped like
    ``template_state`` (optimizer moments included). Returns (state, epoch)."""
    import torch

    bundle = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda sd: {k: np.asarray(v) for k, v in sd.items()}
    m = cfg.model
    g_params, g_stats = generator_from_state_dict(m, to_np(bundle["generator"]))
    d_params, d_stats = discriminator_from_state_dict(m, to_np(bundle["discriminator"]))

    def opt_np(sd):
        return {"state": {int(k): {kk: np.asarray(vv) for kk, vv in e.items()}
                          for k, e in sd["state"].items()},
                "param_groups": sd["param_groups"]}

    g_opt = adam_state_from_dict(_gen_layout(m), g_params, template_state.g_opt,
                                 opt_np(bundle["optimizer_generator"]))
    d_opt = adam_state_from_dict(_disc_layout(m), d_params, template_state.d_opt,
                                 opt_np(bundle["optimizer_discriminator"]))
    state = template_state.replace(
        g_params=g_params, g_stats=g_stats, g_opt=g_opt,
        d_params=d_params, d_stats=d_stats, d_opt=d_opt,
    )
    return state, int(bundle.get("epoch", 1)) - 1
