"""Generate the keras-InceptionV3 golden fixture for converter validation.

Run with a TensorFlow-equipped interpreter (this image: /opt/venv/bin/python):

    /opt/venv/bin/python tools/gen_inception_fixture.py

Builds ``keras.applications.InceptionV3(weights=None, include_top=False,
pooling="avg")`` — an *independent, trusted* implementation of the exact
architecture the reference's FID uses (reference ``src/fid.py:33-63`` via
torchvision; torchvision's inception_v3 is itself a port of this TF graph) —
assigns deterministic seeded weights, and records its 2048-d pooled
activations on fixed inputs plus per-stage diagnostic taps.

The committed fixture (``tests/fixtures/inception_keras_golden.npz``) holds
only the weight *shapes* + seeds + activations (~100 KB): the repo-side test
(``tests/test_inception_keras_parity.py``) regenerates the identical weights
from the same RNG sequence, converts them with
``rnagan_tpu.models.inception.params_from_keras_arrays``, and must reproduce
these activations. This proves the flax architecture + converter are exactly
the TF/keras graph; real pretrained weights (torchvision ``.pth`` or keras
``.h5`` — not downloadable in this zero-egress image) then port losslessly.
"""

import json
import os
import sys

import numpy as np

WEIGHT_SEED = 0
INPUT_SEED = 1
N_INPUTS = 4


def regen_weights(shapes, seed=WEIGHT_SEED):
    """Deterministic weight sequence shared by generator and test.

    For each conv (creation order): kernel ~ N(0, 0.05) in HWIO, then BN
    beta ~ N(0, 0.1), moving_mean ~ N(0, 0.1), moving_var ~ U(0.5, 1.5).
    """
    rs = np.random.RandomState(seed)
    kernels, betas, means, variances = [], [], [], []
    for shp in shapes:
        kh, kw, cin, cout = shp
        kernels.append(rs.normal(0.0, 0.05, (kh, kw, cin, cout)).astype(np.float32))
        betas.append(rs.normal(0.0, 0.1, (cout,)).astype(np.float32))
        means.append(rs.normal(0.0, 0.1, (cout,)).astype(np.float32))
        variances.append(rs.uniform(0.5, 1.5, (cout,)).astype(np.float32))
    return kernels, betas, means, variances


def regen_inputs(seed=INPUT_SEED, n=N_INPUTS):
    """Inputs in [0, 1] (the reference FID contract, fid.py:49-54)."""
    rs = np.random.RandomState(seed)
    return rs.uniform(0.0, 1.0, (n, 299, 299, 3)).astype(np.float32)


def main():
    from keras.applications import InceptionV3
    from keras.layers import BatchNormalization, Conv2D
    from keras.models import Model

    model = InceptionV3(weights=None, include_top=False, pooling="avg",
                        input_shape=(299, 299, 3))

    def idx(name, prefix):
        rest = name[len(prefix):]
        return 0 if rest == "" else int(rest.lstrip("_"))

    convs = sorted((l for l in model.layers if isinstance(l, Conv2D)),
                   key=lambda l: idx(l.name, "conv2d"))
    bns = sorted((l for l in model.layers if isinstance(l, BatchNormalization)),
                 key=lambda l: idx(l.name, "batch_normalization"))
    assert len(convs) == len(bns) == 94, (len(convs), len(bns))

    shapes = [list(l.kernel.shape) for l in convs]
    kernels, betas, means, variances = regen_weights(shapes)
    for conv, bn, k, b, m, v in zip(convs, bns, kernels, betas, means, variances):
        conv.set_weights([k])
        bn.set_weights([b, m, v])  # scale=False: beta, moving_mean, moving_var

    x01 = regen_inputs()
    x_keras = x01 * 2.0 - 1.0  # the flax model applies x*2-1 internally

    taps = ["max_pooling2d_1", "mixed2", "mixed7", "mixed10"]
    tap_model = Model(model.input, [model.get_layer(t).output for t in taps] + [model.output])
    outs = tap_model.predict(x_keras, batch_size=N_INPUTS, verbose=0)
    tap_means = {f"tap_{t}": o.mean(axis=(1, 2)).astype(np.float32)
                 for t, o in zip(taps, outs[:-1])}
    features = outs[-1].astype(np.float32)

    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "inception_keras_golden.npz")
    np.savez_compressed(
        path,
        shapes=np.asarray(shapes, np.int32),
        weight_seed=np.int32(WEIGHT_SEED),
        input_seed=np.int32(INPUT_SEED),
        n_inputs=np.int32(N_INPUTS),
        features=features,
        conv_names=np.asarray(json.dumps([l.name for l in convs])),
        **tap_means,
    )
    print(f"wrote {path}: features {features.shape}, "
          f"|f| mean {np.abs(features).mean():.4f}")


if __name__ == "__main__":
    sys.exit(main())
