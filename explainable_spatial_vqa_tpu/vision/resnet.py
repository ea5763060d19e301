"""Flax ResNet-101 truncated after stage 3 (torchvision ``layer3``).

Feature-extraction parity target: the reference truncates torchvision
resnet101 after layer3 and emits (N, 1024, 14, 14) float32 maps for 224x224
inputs (/root/reference/code/preprocess_images/extract_features.py:25-48).

Architecture matches torchvision exactly (bottleneck v1, stride-2 downsample
convs, BN after every conv).  The extractor is frozen/eval-only, so batch
norm is a fixed affine transform using stored running statistics
(``FrozenBatchNorm``).  ``params_from_torch_state_dict`` converts a
torchvision ``resnet101`` state dict (the environment has torch but no
downloaded weights; point it at a checked-out ``resnet101-*.pth`` to get
numeric parity with the reference features).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["ResNetFeatures", "params_from_torch_state_dict", "IMAGENET_MEAN", "IMAGENET_STD"]

# Reference normalization constants (extract_features.py:53-54).  NB the
# reference's std BLUE channel is 0.224 (not the canonical 0.225) — kept
# verbatim for feature parity.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.224], np.float32)

# Bottleneck counts for ResNet-101 stages 1..3 (torchvision layers 1..3).
RESNET101_STAGES = (3, 4, 23)


class FrozenBatchNorm(nn.Module):
    """Inference-only BN: y = (x - mean) / sqrt(var + eps) * scale + bias."""

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * inv + (bias - mean * inv).astype(self.dtype)


class Bottleneck(nn.Module):
    mid: int
    out: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, name=name,
        )
        identity = x
        h = conv(self.mid, 1, 1, "conv1")(x)
        h = FrozenBatchNorm(self.mid, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = conv(self.mid, 3, self.stride, "conv2")(h)
        h = FrozenBatchNorm(self.mid, dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = conv(self.out, 1, 1, "conv3")(h)
        h = FrozenBatchNorm(self.out, dtype=self.dtype, name="bn3")(h)
        if self.downsample:
            identity = conv(self.out, 1, self.stride, "downsample_conv")(x)
            identity = FrozenBatchNorm(self.out, dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(h + identity)


class ResNetFeatures(nn.Module):
    """Stem + stages 1..``num_stages``; returns NHWC feature maps."""

    num_stages: int = 3
    stage_sizes: Sequence[int] = RESNET101_STAGES
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, H, W, 3) normalized; returns (N, H/16, W/16, 1024) for the
        default 3-stage truncation."""
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        channels = 256
        for stage in range(self.num_stages):
            blocks = self.stage_sizes[stage]
            stride = 1 if stage == 0 else 2
            for block in range(blocks):
                h = Bottleneck(
                    mid=channels // 4,
                    out=channels,
                    stride=stride if block == 0 else 1,
                    downsample=block == 0,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(h)
            channels *= 2
        return h


def params_from_torch_state_dict(state_dict: Mapping[str, Any], num_stages: int = 3) -> Dict:
    """Convert a torchvision resnet101 state dict to ResNetFeatures params.

    Accepts tensors or numpy arrays.  Conv weights are transposed OIHW->HWIO.
    """

    def to_np(t: Any) -> np.ndarray:
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t)

    def conv(key: str) -> np.ndarray:
        return to_np(state_dict[key]).transpose(2, 3, 1, 0)  # OIHW -> HWIO

    def bn(prefix: str) -> Dict[str, np.ndarray]:
        return {
            "scale": to_np(state_dict[f"{prefix}.weight"]),
            "bias": to_np(state_dict[f"{prefix}.bias"]),
            "mean": to_np(state_dict[f"{prefix}.running_mean"]),
            "var": to_np(state_dict[f"{prefix}.running_var"]),
        }

    params: Dict[str, Any] = {}
    if "conv1.weight" in state_dict:
        params["conv1"] = {"kernel": conv("conv1.weight")}
        params["bn1"] = bn("bn1")
    for stage in range(num_stages):
        layer = f"layer{stage + 1}"
        for block in range(RESNET101_STAGES[stage]):
            if f"{layer}.{block}.conv1.weight" not in state_dict:
                continue
            src = f"{layer}.{block}"
            dst: Dict[str, Any] = {
                "conv1": {"kernel": conv(f"{src}.conv1.weight")},
                "bn1": bn(f"{src}.bn1"),
                "conv2": {"kernel": conv(f"{src}.conv2.weight")},
                "bn2": bn(f"{src}.bn2"),
                "conv3": {"kernel": conv(f"{src}.conv3.weight")},
                "bn3": bn(f"{src}.bn3"),
            }
            if f"{src}.downsample.0.weight" in state_dict:
                dst["downsample_conv"] = {"kernel": conv(f"{src}.downsample.0.weight")}
                dst["downsample_bn"] = bn(f"{src}.downsample.1")
            params[f"{layer}_block{block}"] = dst
    return {"params": params}
