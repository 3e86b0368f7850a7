"""Anti-spoofing ResNet family — 2-D feature-map classifiers.

TPU-native counterparts of the reference's residual models
(reference/ASV_dl_func.py:541-641, 708-743):

- ``ResidualBlock``: conv3x3 -> BN -> LeakyReLU(0.01) -> Dropout2d(0.5) ->
  conv3x3(stride) summed with a 1x1-conv shortcut, then post-add BN +
  LeakyReLU. Note the reference applies BN *after* the residual add
  (reference/ASV_dl_func.py:576-578) — preserved.
- ``AntiSpoofingResNet``: 1->32 stem, six 32->32 blocks (first stride 3),
  global average pool, 32->256->num_classes head. Also exposes a two-part
  decomposition (``feature_maps`` / ``classify_features``) for Grad-CAM —
  the reference hooks ``residual_blocks[5].conv2`` via Captum
  (ASV_deep_learning.ipynb cell 34).
- ``ExtractFeatureResidual`` / ``MoreFeaturesClassifier``: the same trunk
  ending in a 64-d embedding, shared across three feature maps whose
  embeddings concat into a 192->128->256->2 MLP
  (reference/ASV_dl_func.py:618-641).

Layout: channel-last ``(B, H, W, C)``; 3-D inputs get a channel axis added
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

    def setup(self):
        self.conv1 = nn.Conv(self.features, (3, 3), strides=(1, 1), padding=1, use_bias=False)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.drop = nn.Dropout(self.dropout, broadcast_dims=(1, 2))
        self.conv2 = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride), padding=1, use_bias=False
        )
        self.bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.needs_projection = self.stride != 1
        self.shortcut_conv = nn.Conv(
            self.features, (1, 1), strides=(self.stride, self.stride), use_bias=False
        )
        self.shortcut_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        out = self.conv1(x)
        out = self.bn1(out, use_running_average=not train)
        out = _leaky(out)
        out = self.drop(out, deterministic=not train)
        out = self.conv2(out)

        if self.needs_projection or x.shape[-1] != self.features:
            shortcut = self.shortcut_conv(x)
            shortcut = self.shortcut_bn(shortcut, use_running_average=not train)
        else:
            shortcut = x

        out = out + shortcut
        out = self.bn2(out, use_running_average=not train)  # post-add BN (reference order)
        return _leaky(out)


class ResNetTrunk(nn.Module):
    """Stem + six residual blocks; pooled or spatial output."""

    features: int = 32

    def setup(self):
        self.stem_conv = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)
        self.stem_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        strides = (3, 1, 1, 1, 1, 1)
        self.blocks = [
            ResidualBlock(self.features, stride=s, name=f"block{i}")
            for i, s in enumerate(strides)
        ]

    def __call__(
        self, x: jnp.ndarray, *, train: bool = False, pool: bool = True
    ) -> jnp.ndarray:
        h = self.stem_conv(x)
        h = self.stem_bn(h, use_running_average=not train)
        h = _leaky(h)
        for block in self.blocks:
            h = block(h, train=train)
        if pool:
            return jnp.mean(h, axis=(1, 2))  # AdaptiveAvgPool2d((1,1)) + flatten
        return h


def _ensure_channels(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., None] if x.ndim == 3 else x


class AntiSpoofingResNet(nn.Module):
    num_classes: int = 2
    dropout: float = 0.5

    def setup(self):
        self.trunk = ResNetTrunk()
        self.fc1 = nn.Dense(256)
        self.drop = nn.Dropout(self.dropout)
        self.fc2 = nn.Dense(self.num_classes)

    def _head(self, h: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = self.fc1(h)
        h = self.drop(h, deterministic=not train)
        h = _leaky(h)
        return self.fc2(h)

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h = self.trunk(_ensure_channels(x), train=train)
        return self._head(h, train)

    def feature_maps(self, x: jnp.ndarray) -> jnp.ndarray:
        """Last residual block's spatial output (B, H', W', 32), eval mode."""
        return self.trunk(_ensure_channels(x), train=False, pool=False)

    def classify_features(self, fmap: jnp.ndarray) -> jnp.ndarray:
        """Resume the forward from feature_maps() output (eval mode)."""
        return self._head(jnp.mean(fmap, axis=(1, 2)), train=False)


class ExtractFeatureResidual(nn.Module):
    """Trunk ending in a 64-d embedding (reference/ASV_dl_func.py:582-616)."""

    def setup(self):
        self.trunk = ResNetTrunk()
        self.fc1 = nn.Dense(256)
        self.drop = nn.Dropout(0.5)
        self.fc2 = nn.Dense(64)

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h = self.trunk(_ensure_channels(x), train=train)
        h = self.fc1(h)
        h = self.drop(h, deterministic=not train)
        h = _leaky(h)
        return self.fc2(h)


class MoreFeaturesClassifier(nn.Module):
    """Three feature maps through ONE shared trunk, concat -> MLP -> 2.

    The reference shares a single ``ExtractFeatureResidual`` instance across
    all three inputs (reference/ASV_dl_func.py:633-638) — mirrored here.
    """

    num_classes: int = 2

    def setup(self):
        self.extractor = ExtractFeatureResidual()
        self.fc1 = nn.Dense(128)
        self.drop1 = nn.Dropout(0.5)
        self.fc2 = nn.Dense(256)
        self.drop2 = nn.Dropout(0.5)
        self.fc3 = nn.Dense(self.num_classes)

    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, x3: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        emb = jnp.concatenate(
            [self.extractor(x, train=train) for x in (x1, x2, x3)], axis=-1
        )  # (B, 192)
        h = self.fc1(emb)
        h = self.drop1(h, deterministic=not train)
        h = _leaky(h)
        h = self.fc2(h)
        h = self.drop2(h, deterministic=not train)
        h = _leaky(h)
        return self.fc3(h)
