"""MobileNetV2 + MFCA — the notebook-only spectrogram classifier.

Counterpart of ``AudioDeepfakeModel`` (ASV_deep_learning.ipynb cell 28):
torchvision MobileNetV2 features with a 1-channel stem, channels split into
low/mid/high thirds, an "MFCA" squeeze-excitation with a DCT/IDCT round
trip on the attention vector, global average pool, 1280->256->2 head.

Two reference quirks handled explicitly:
- the reference's ``dct_2d`` detaches to numpy (breaking autograd/GPU);
  here the DCT is an on-device orthonormal matmul, so the module trains
  end-to-end;
- the DCT->IDCT round trip is applied to the (B, C, 1, 1) attention vector,
  where an orthonormal transform over singleton spatial axes is the
  identity — so ``attn = sigmoid(y + idct(dct(y))) == sigmoid(2 y)``.
  Preserved (it is the reference's math), implemented generally so non-1x1
  uses remain correct.

MobileNetV2 is implemented from the published architecture (inverted
residual bottlenecks, ReLU6, width 1.0).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from audioanalysisdetector_tpu.frontend.dct import dct_ii_matrix

# (expansion t, out channels c, repeats n, stride s) — MobileNetV2 table 2
_INVERTED_RESIDUAL_CFG = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=pad,
            feature_group_count=self.groups, use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3)(x)
        return _relu6(x)


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, *, train: bool):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        h = x
        if self.expand != 1:
            h = _ConvBNReLU(hidden, kernel=1)(h, train=train)
        h = _ConvBNReLU(hidden, kernel=3, stride=self.stride, groups=hidden)(h, train=train)
        h = nn.Conv(self.features, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3)(h)
        if self.stride == 1 and in_ch == self.features:
            return x + h
        return h


class MobileNetV2Features(nn.Module):
    """Feature trunk with a single-channel stem: (B, H, W, 1) -> (B, h, w, 1280)."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = _ConvBNReLU(32, kernel=3, stride=2)(x, train=train)
        for t, c, n, s in _INVERTED_RESIDUAL_CFG:
            for i in range(n):
                h = InvertedResidual(c, stride=s if i == 0 else 1, expand=t)(h, train=train)
        return _ConvBNReLU(1280, kernel=1)(h, train=train)


def dct_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal DCT-II over the last two axes (on-device matmuls)."""
    Mh = jnp.asarray(dct_ii_matrix(x.shape[-2]), x.dtype)
    Mw = jnp.asarray(dct_ii_matrix(x.shape[-1]), x.dtype)
    return jnp.einsum("ij,...jk,lk->...il", Mh, x, Mw)


def idct_2d(x: jnp.ndarray) -> jnp.ndarray:
    Mh = jnp.asarray(dct_ii_matrix(x.shape[-2]), x.dtype)
    Mw = jnp.asarray(dct_ii_matrix(x.shape[-1]), x.dtype)
    return jnp.einsum("ji,...jk,kl->...il", Mh, x, Mw)


class MFCAModule(nn.Module):
    """Multi-frequency channel attention (the reference's SE + DCT round trip)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x_low, x_mid, x_high):
        x = jnp.concatenate([x_low, x_mid, x_high], axis=-1)  # (B, h, w, C)
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # squeeze
        y = nn.relu(nn.Dense(c // self.reduction)(y))
        y = nn.sigmoid(nn.Dense(c)(y))  # (B, C)
        y_sp = y[:, None, None, :].transpose(0, 3, 1, 2)  # (B, C, 1, 1)
        y_rt = idct_2d(dct_2d(y_sp)).transpose(0, 2, 3, 1)[:, 0, 0]  # == y for 1x1
        attn = nn.sigmoid(y + y_rt)
        return x * attn[:, None, None, :]


class MobileNetMFCA(nn.Module):
    """Full model: features -> thirds -> MFCA -> pool -> 1280->256->num_classes."""

    num_classes: int = 2
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[..., None]
        feats = MobileNetV2Features(name="features")(x, train=train)
        c = feats.shape[-1]
        low, mid, high = (
            feats[..., : c // 3],
            feats[..., c // 3 : 2 * c // 3],
            feats[..., 2 * c // 3 :],
        )
        fused = MFCAModule(name="mfca")(low, mid, high)
        pooled = jnp.mean(fused, axis=(1, 2))
        h = nn.relu(nn.Dense(256, name="fc1")(pooled))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.num_classes, name="fc2")(h)
