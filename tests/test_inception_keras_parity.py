"""Golden-activation cross-validation of the flax InceptionV3 against the
real keras/TF implementation.

The fixture (``tests/fixtures/inception_keras_golden.npz``) was produced by
``tools/gen_inception_fixture.py`` running keras-applications InceptionV3
under TensorFlow — an independent, trusted implementation of the TF-slim
graph that torchvision's ``inception_v3`` (the reference FID network,
reference ``src/fid.py:37``) is itself a port of. The fixture stores only
weight shapes + RNG seeds + the TF model's 2048-d pooled activations; this
test regenerates the identical weights, converts them through
``params_from_keras_arrays``, and must reproduce TF's activations through all
94 conv/BN pairs.

Passing proves the architecture and the weight-conversion path are exactly
right end-to-end, so real pretrained weights (keras ``.h5`` or torchvision
``.pth`` — not downloadable in this zero-egress image) port losslessly.
"""

import json
import os
import sys

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "inception_keras_golden.npz")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


def test_fixture_structure(golden):
    shapes = golden["shapes"]
    assert shapes.shape == (94, 4)
    assert golden["features"].shape == (int(golden["n_inputs"]), 2048)
    # creation-order names are contiguous conv2d[_i]
    names = json.loads(str(golden["conv_names"]))
    assert names[0] == "conv2d" and names[-1] == "conv2d_93"


def test_conv_order_shapes_match_flax_model(golden):
    """The converter's creation-order path list must line up with the flax
    model's actual parameter shapes, conv by conv."""
    import jax
    import jax.numpy as jnp

    from rnagan_tpu.models.inception import KERAS_CONV_ORDER, InceptionV3Features

    model = InceptionV3Features(transform_input=False)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 299, 299, 3), jnp.float32)),
        jax.random.key(0),
    )
    params = variables["params"]
    for path, shp in zip(KERAS_CONV_ORDER, golden["shapes"]):
        node = params
        for p in path:
            node = node[p]
        assert tuple(node["conv"]["kernel"].shape) == tuple(shp), path


def test_activations_match_keras(golden):
    from gen_inception_fixture import regen_inputs, regen_weights

    from rnagan_tpu.models.inception import InceptionV3Features, params_from_keras_arrays

    kernels, betas, means, variances = regen_weights(
        [tuple(s) for s in golden["shapes"]], int(golden["weight_seed"])
    )
    variables = params_from_keras_arrays(kernels, betas, means, variances)
    x01 = regen_inputs(int(golden["input_seed"]), int(golden["n_inputs"]))

    import jax

    model = InceptionV3Features(transform_input=False, torch_pool=False)
    feats = np.asarray(jax.jit(model.apply)(variables, x01))

    ref = golden["features"]
    # 94 conv/BN layers of f32 accumulation across two independent stacks
    # (XLA-CPU vs TF-CPU): agreement to ~1e-3 absolute on O(10) activations
    # is bit-level-equivalent architecture; a wiring error is catastrophic
    # (random features decorrelate completely).
    np.testing.assert_allclose(feats, ref, rtol=2e-4, atol=2e-3)
    corr = np.corrcoef(feats.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999999, corr


def test_torch_pool_changes_border_semantics(golden):
    """Sanity check that the torchvision/TF avg-pool border distinction is
    real and wired: the two modes must differ (it is the one numerical
    difference between the two graphs)."""
    from gen_inception_fixture import regen_inputs, regen_weights

    import jax

    from rnagan_tpu.models.inception import InceptionV3Features, params_from_keras_arrays

    kernels, betas, means, variances = regen_weights(
        [tuple(s) for s in golden["shapes"]], int(golden["weight_seed"])
    )
    variables = params_from_keras_arrays(kernels, betas, means, variances)
    x01 = regen_inputs(int(golden["input_seed"]), 2)

    tf_mode = np.asarray(jax.jit(
        InceptionV3Features(transform_input=False, torch_pool=False).apply)(variables, x01))
    torch_mode = np.asarray(jax.jit(
        InceptionV3Features(transform_input=False, torch_pool=True).apply)(variables, x01))
    assert not np.allclose(tf_mode, torch_mode, atol=1e-4)
