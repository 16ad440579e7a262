"""FID: frechet-distance math vs scipy and closed forms, inception feature
extraction contract, and metric sanity (FID(x,x)=0, separated > close)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnagan_tpu.eval.fid import (
    InceptionExtractor,
    calculate_activation_statistics,
    calculate_fid,
    calculate_frechet_distance,
)


def _spd(n, seed):
    a = np.random.RandomState(seed).randn(n, n)
    return a @ a.T / n + np.eye(n) * 0.1


def test_frechet_distance_matches_scipy():
    mu1, mu2 = np.zeros(16), np.ones(16) * 0.5
    s1, s2 = _spd(16, 0), _spd(16, 1)
    ours = calculate_frechet_distance(mu1, s1, mu2, s2, method="eigh")
    ref = calculate_frechet_distance(mu1, s1, mu2, s2, method="scipy")
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_frechet_distance_closed_forms():
    # identical distributions -> 0
    s = _spd(8, 2)
    assert abs(calculate_frechet_distance(np.zeros(8), s, np.zeros(8), s)) < 1e-4
    # diagonal case: d^2 = |mu|^2 + sum (sqrt(a)-sqrt(b))^2
    a = np.diag([1.0, 4.0])
    b = np.diag([9.0, 16.0])
    expect = 2.0 + (1 - 3) ** 2 + (2 - 4) ** 2
    got = calculate_frechet_distance(np.ones(2), a, np.zeros(2), b)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_frechet_singular_eps_path():
    # rank-deficient covariances exercise the jitter path
    s1 = np.zeros((4, 4))
    s1[0, 0] = 1.0
    s2 = np.zeros((4, 4))
    s2[1, 1] = 1.0
    got = calculate_frechet_distance(np.zeros(4), s1, np.zeros(4), s2)
    ref = calculate_frechet_distance(np.zeros(4), s1, np.zeros(4), s2, method="scipy")
    np.testing.assert_allclose(got, ref, atol=1e-3)


@pytest.fixture(scope="module")
def small_extractor():
    # full InceptionV3 on CPU is slow; share one extractor across tests
    return InceptionExtractor(dtype=jnp.float32)


def test_inception_activation_contract(small_extractor, rng):
    imgs = rng.rand(3, 64, 64, 3).astype(np.float32)  # resized on device
    acts = small_extractor(imgs, batch_size=4)
    assert acts.shape == (3, 2048)
    assert np.isfinite(acts).all()
    # deterministic
    acts2 = small_extractor(imgs, batch_size=4)
    np.testing.assert_allclose(acts, acts2, atol=1e-6)


def test_fid_sanity_identical_vs_shifted(small_extractor, rng):
    x = rng.rand(8, 64, 64, 3).astype(np.float32)
    near = np.clip(x + rng.randn(*x.shape).astype(np.float32) * 0.01, 0, 1)
    far = rng.rand(8, 64, 64, 3).astype(np.float32) * 0.2  # darker distribution
    fid_self = calculate_fid(x, x, batch_size=8, extractor=small_extractor)
    fid_near = calculate_fid(x, near, batch_size=8, extractor=small_extractor)
    fid_far = calculate_fid(x, far, batch_size=8, extractor=small_extractor)
    assert abs(fid_self) < 1e-3
    assert fid_near < fid_far


def test_torchvision_weight_port_mapping():
    """The port function maps a synthetic torch-layout state_dict onto the
    flax tree (full pretrained weights are an external artifact)."""
    from rnagan_tpu.models.inception import init_inception, params_from_torch_state_dict

    _, variables = init_inception(jax.random.key(0))
    # build a fake torch state_dict matching our init shapes
    sd = {}

    def walk(params, stats, prefix):
        for name, leaf in params.items():
            path = f"{prefix}.{name}" if prefix else name
            if name == "conv":
                sd[path + ".weight"] = np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1)
            elif name == "bn":
                sd[path + ".weight"] = np.asarray(leaf["scale"])
                sd[path + ".bias"] = np.asarray(leaf["bias"])
                sd[path + ".running_mean"] = np.asarray(stats[name]["mean"]) + 0.25
                sd[path + ".running_var"] = np.asarray(stats[name]["var"]) * 2.0
            else:
                walk(leaf, stats[name], path)

    walk(variables["params"], variables["batch_stats"], "")
    sd["fc.weight"] = np.zeros((1000, 2048))  # must be ignored
    ported = params_from_torch_state_dict(sd)
    k0 = np.asarray(ported["params"]["Conv2d_1a_3x3"]["conv"]["kernel"])
    np.testing.assert_allclose(k0, np.asarray(variables["params"]["Conv2d_1a_3x3"]["conv"]["kernel"]))
    # running stats transformed as constructed (proves stats landed in tree)
    np.testing.assert_allclose(
        np.asarray(ported["batch_stats"]["Mixed_7c"]["branch_pool"]["bn"]["mean"]),
        np.asarray(variables["batch_stats"]["Mixed_7c"]["branch_pool"]["bn"]["mean"]) + 0.25,
    )
    jax.tree_util.tree_structure(ported["params"]) == jax.tree_util.tree_structure(variables["params"])
