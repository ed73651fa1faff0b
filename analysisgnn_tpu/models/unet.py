"""2-D convolutional UNet (flax).

Companion of the reference's vendored UNet (analysisgnn/models/core/
unet.py:8-38 — present in the model zoo but unused by the main analysis
path; kept here for capability parity, e.g. pianoroll-image experiments).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.relu(nn.GroupNorm(num_groups=min(8, self.features))(x))
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        return nn.relu(nn.GroupNorm(num_groups=min(8, self.features))(x))


class UNet(nn.Module):
    """Encoder-decoder with skip connections over [B, H, W, C] images."""

    features: Sequence[int] = (32, 64, 128)
    out_channels: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        skips = []
        for f in self.features[:-1]:
            x = ConvBlock(f)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.features[-1])(x)
        for f, skip in zip(reversed(self.features[:-1]), reversed(skips)):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            x = nn.Conv(f, (2, 2), padding="SAME")(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(f)(x)
        return nn.Conv(self.out_channels, (1, 1))(x)
