"""Fused feature-extraction pipeline: images -> (N, 1024, 14, 14) h5.

The reference decodes/resizes serially with PIL then forwards batches of 128
(extract_features.py:100-129).  Here decode stays on host (PIL, parallelized
across workers) while resize -> normalize -> ResNet forward runs as ONE jitted
function on device; output is streamed to the features h5 in NCHW float32 for
byte-compatible artifact layout.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from explainable_spatial_vqa_tpu.core.artifacts import FeatureWriter
from explainable_spatial_vqa_tpu.vision.resnet import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    ResNetFeatures,
)

__all__ = ["collect_image_paths", "make_extract_fn", "extract_features"]


def collect_image_paths(image_dir: str, max_images: Optional[int] = None) -> List[str]:
    """Sort *.png by trailing index; assert dense 0..N-1
    (extract_features.py:71-87)."""
    entries: List[Tuple[str, int]] = []
    for fn in os.listdir(image_dir):
        if not fn.endswith(".png"):
            continue
        idx = int(os.path.splitext(fn)[0].split("_")[-1])
        entries.append((os.path.join(image_dir, fn), idx))
    entries.sort(key=lambda e: e[1])
    if not entries:
        raise ValueError("No valid images found in the input directory.")
    indices = [i for _, i in entries]
    assert len(set(indices)) == len(entries)
    assert min(indices) == 0 and max(indices) == len(entries) - 1
    if max_images is not None:
        entries = entries[:max_images]
    return [p for p, _ in entries]


def make_extract_fn(model: ResNetFeatures, variables, size: Tuple[int, int] = (224, 224)):
    """One jitted device function: uint8 NHWC -> resize(cubic) -> normalize ->
    ResNet -> NCHW float32 features."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    @jax.jit
    def extract(images_u8: jnp.ndarray) -> jnp.ndarray:
        x = images_u8.astype(jnp.float32)
        if x.shape[1:3] != size:
            x = jax.image.resize(
                x, (x.shape[0], size[0], size[1], 3), method="cubic"
            )
        x = (x / 255.0 - mean) / std
        feats = model.apply(variables, x)  # (N, h, w, C)
        return jnp.transpose(feats, (0, 3, 1, 2))  # NCHW, artifact layout

    return extract


def _decode(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, np.uint8)


def _decode_resize_pil(path: str, size: Tuple[int, int]) -> np.ndarray:
    """Reference-exact decode+resize: PIL BICUBIC on uint8, re-quantized to
    uint8 by PIL (extract_features.py:104-111).  Use for byte-level feature
    parity with the reference .h5 artifacts; the device resize (jax cubic on
    float) is the default fast path."""
    from PIL import Image

    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    img = img.resize((size[1], size[0]), Image.BICUBIC)  # PIL takes (W, H)
    return np.asarray(img, np.uint8)


def extract_features(
    image_paths: Sequence[str],
    output_h5: str,
    model: Optional[ResNetFeatures] = None,
    variables=None,
    batch_size: int = 128,
    decode_workers: int = 8,
    size: Tuple[int, int] = (224, 224),
    resize: str = "device",
) -> None:
    """Stream features for ``image_paths`` into ``output_h5``.

    Host decode runs in a thread pool overlapping the device forward.
    ``resize``: "device" (jax cubic, fused into the jitted forward — fast) or
    "pil" (host PIL BICUBIC with uint8 re-quantization — bit-matches the
    reference preprocessing, extract_features.py:104-111).
    """
    if model is None:
        model = ResNetFeatures()
    if variables is None:
        dummy = jnp.zeros((1, size[0], size[1], 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy)
    extract = make_extract_fn(model, variables, size)
    if resize == "pil":
        decode = lambda p: _decode_resize_pil(p, size)  # noqa: E731
    elif resize == "device":
        decode = _decode
    else:
        raise ValueError(f"unknown resize mode {resize!r} (device|pil)")

    with FeatureWriter(output_h5, total=len(image_paths)) as writer:
        with ThreadPoolExecutor(decode_workers) as pool:
            pending = None
            for start in range(0, len(image_paths), batch_size):
                chunk = image_paths[start : start + batch_size]
                decoded = list(pool.map(decode, chunk))
                batch = np.stack(decoded)
                feats = extract(jnp.asarray(batch))
                if pending is not None:
                    writer.append(np.asarray(pending))
                pending = feats  # overlap: write previous while next computes
            if pending is not None:
                writer.append(np.asarray(pending))
