"""Bag aggregation and multimodal fusion heads.

The reference's SSL/fusion pipeline (``src/main.py``) imports an
``AggregationModel``/``FusionModel`` from modules that were never shipped
(``main.py:14-17``, SURVEY.md section 2.5); ``ml_experiments.py:27-47``
contains the surviving AggregationModel sketch (bag-mean ResNet features ->
FC head). These modules implement that declared intent TPU-natively:

* :class:`AggregationModel` — ResNet features per tile, mean over the bag,
  linear classifier head (reference ``ml_experiments.py:27-47``);
* :class:`FusionModel` — concatenates bag-aggregated image features with the
  RNAEncoder embedding of the patient's expression and classifies
  (the ``main.py:145-154`` wiring).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rnagan_tpu.models.betavae import RNAEncoder
from rnagan_tpu.models.resnet import ResNet


class AggregationModel(nn.Module):
    """Bag of tiles -> mean ResNet feature -> linear head."""

    backbone: ResNet
    num_classes: int = 2

    @nn.compact
    def __call__(self, bags: jax.Array, train: bool = False) -> jax.Array:
        """bags: (B, bag, H, W, C) -> logits (B, num_classes)."""
        b, bag, h, w, c = bags.shape
        feats = self.backbone(bags.reshape(b * bag, h, w, c), train=train, extract=True)
        feats = feats.reshape(b, bag, -1).mean(axis=1)
        return nn.Dense(self.num_classes, name="head")(feats)


class FusionModel(nn.Module):
    """Image bags + RNA expression -> joint classification."""

    backbone: ResNet
    rna_hidden_dims: Sequence[int] = (6000, 4000, 2048)
    num_classes: int = 2

    @nn.compact
    def __call__(self, bags: jax.Array, rna: jax.Array, train: bool = False) -> jax.Array:
        b, bag, h, w, c = bags.shape
        img = self.backbone(bags.reshape(b * bag, h, w, c), train=train, extract=True)
        img = img.reshape(b, bag, -1).mean(axis=1)
        rna_feat = RNAEncoder(self.rna_hidden_dims)(rna, train=train)
        joint = jnp.concatenate([img, rna_feat.astype(img.dtype)], axis=-1)
        joint = nn.Dense(512, name="fuse")(joint)
        joint = nn.relu(joint)
        return nn.Dense(self.num_classes, name="head")(joint)
