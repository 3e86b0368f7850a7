"""Anti-spoofing ResNet family — 2-D feature-map classifiers.

TPU-native counterparts of the reference's residual models
(reference/ASV_dl_func.py:541-641, 708-743):

- ``ResidualBlock``: conv3x3 -> BN -> LeakyReLU(0.01) -> Dropout2d(0.5) ->
  conv3x3(stride) summed with a 1x1-conv shortcut, then post-add BN +
  LeakyReLU. Note the reference applies BN *after* the residual add
  (reference/ASV_dl_func.py:576-578) — preserved.
- ``AntiSpoofingResNet``: 1->32 stem, six 32->32 blocks (first stride 3),
  global average pool, 32->256->num_classes head.
- ``ExtractFeatureResidual`` / ``MoreFeaturesClassifier``: the same trunk
  ending in a 64-d embedding, shared across three feature maps whose
  embeddings concat into a 192->128->256->2 MLP
  (reference/ASV_dl_func.py:618-641).

Layout: channel-last ``(B, H, W, C)``; the data layer adds the channel axis
(the reference's datasets insert a leading channel dim instead,
reference/ASV_dl_func.py:702-705).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class ResidualBlock(nn.Module):
    features: int = 32
    stride: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        out = nn.Conv(self.features, (3, 3), strides=(1, 1), padding=1, use_bias=False, name="conv1")(x)
        out = bn("bn1")(out)
        out = _leaky(out)
        out = nn.Dropout(self.dropout, deterministic=not train, broadcast_dims=(1, 2))(out)
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, name="conv2",
        )(out)

        if self.stride != 1 or x.shape[-1] != self.features:
            shortcut = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="shortcut_conv",
            )(x)
            shortcut = bn("shortcut_bn")(shortcut)
        else:
            shortcut = x

        out = out + shortcut
        out = bn("bn2")(out)  # post-add BN, the reference's ordering
        return _leaky(out)


class ResNetTrunk(nn.Module):
    """Stem + six residual blocks + global average pool -> (B, 32)."""

    features: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="stem_conv")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="stem_bn")(h)
        h = _leaky(h)
        strides = (3, 1, 1, 1, 1, 1)
        for i, s in enumerate(strides):
            h = ResidualBlock(self.features, stride=s, name=f"block{i}")(h, train=train)
        return jnp.mean(h, axis=(1, 2))  # AdaptiveAvgPool2d((1, 1)) + flatten


class AntiSpoofingResNet(nn.Module):
    num_classes: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.ndim == 3:  # (B, H, W) -> add channel axis
            x = x[..., None]
        h = ResNetTrunk(name="trunk")(x, train=train)
        h = nn.Dense(256, name="fc1")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _leaky(h)
        return nn.Dense(self.num_classes, name="fc2")(h)


class ExtractFeatureResidual(nn.Module):
    """Trunk ending in a 64-d embedding (reference/ASV_dl_func.py:582-616)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[..., None]
        h = ResNetTrunk(name="trunk")(x, train=train)
        h = nn.Dense(256, name="fc1")(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = _leaky(h)
        return nn.Dense(64, name="fc2")(h)


class MoreFeaturesClassifier(nn.Module):
    """Three feature maps through ONE shared trunk, concat -> MLP -> 2.

    The reference shares a single ``ExtractFeatureResidual`` instance across
    all three inputs (reference/ASV_dl_func.py:633-638) — mirrored here by
    invoking one submodule three times.
    """

    num_classes: int = 2

    @nn.compact
    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, x3: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        extractor = ExtractFeatureResidual(name="extractor")
        emb = jnp.concatenate(
            [extractor(x1, train=train), extractor(x2, train=train), extractor(x3, train=train)],
            axis=-1,
        )  # (B, 192)
        h = nn.Dense(128, name="fc1")(emb)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = _leaky(h)
        h = nn.Dense(256, name="fc2")(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = _leaky(h)
        return nn.Dense(self.num_classes, name="fc3")(h)
