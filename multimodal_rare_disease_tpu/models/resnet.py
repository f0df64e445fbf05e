"""ResNet-50 image backbone, TPU-native.

Re-designed equivalent of the reference's torchvision-ResNet50 backbone
(`src/cnn_encoder.py:73-100`): NHWC layout (XLA's native TPU conv layout),
bf16 compute / f32 params, BatchNorm statistics computed over the global
(mesh-wide) batch under jit, and a stage-structured forward that exposes
intermediate feature maps for Grad-CAM (`get_intermediate_features`
analogue, `src/cnn_encoder.py:200-242`) without PyTorch hooks.

Stages (torchvision naming → ours): conv1+bn+pool = "stem", layer1..4 =
stage1..4. `freeze_stages=N` freezes stem + first N-? — freezing is
implemented in the optimizer (optax mask over param paths), not here.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BottleneckBlock(nn.Module):
    """1x1 → 3x3 → 1x1 bottleneck with projection shortcut when needed."""

    filters: int  # inner width; output width = 4 * filters
    strides: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f,
            (k, k),
            strides=(s, s),
            padding=[(k // 2, k // 2)] * 2,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

        residual = x
        out = conv(self.filters, 1, 1, "conv1")(x)
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = conv(self.filters, 3, self.strides, "conv2")(out)
        out = norm("bn2")(out)
        out = nn.relu(out)
        out = conv(self.filters * 4, 1, 1, "conv3")(out)
        out = norm("bn3")(out)

        if residual.shape[-1] != self.filters * 4 or self.strides != 1:
            residual = conv(self.filters * 4, 1, self.strides, "downsample_conv")(x)
            residual = norm("downsample_bn")(residual)

        return nn.relu(out + residual)


class ResNet50Encoder(nn.Module):
    """ResNet-50 feature extractor: [B,H,W,3] → 2048-d pooled features.

    Returns (pooled, features) where features maps stage names to NHWC
    feature maps (stage4 is the Grad-CAM target layer — the reference's
    `layer4`, `src/cnn_encoder.py:186-198`).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        x = x.astype(self.dtype)
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="stem_bn",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        features: Dict[str, jnp.ndarray] = {}
        for i, (num_blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for b in range(num_blocks):
                strides = 2 if (b == 0 and i > 0) else 1
                x = BottleneckBlock(
                    filters=width,
                    strides=strides,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"stage{i + 1}_block{b}",
                )(x, train=train)
            features[f"stage{i + 1}"] = x

        pooled = jnp.mean(x, axis=(1, 2))  # global average pool → [B, 2048]
        return pooled, features

    @staticmethod
    def num_stages() -> int:
        return 4

    @staticmethod
    def feature_dim() -> int:
        return 2048
