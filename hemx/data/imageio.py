"""Host-side image decode/resize helpers for dataset plugins.

Replaces tf.image.decode_image / resize_images in the reference's parse
functions (hem/data/*.py). PIL provides the codecs; resize is bilinear like
the TF default. (Deviation note: PIL and TF bilinear resampling differ by
<1 LSB at 8-bit — irrelevant for training statistics.)
"""

from __future__ import annotations

import io

import numpy as np


def decode_image(data: bytes, channels: int = 3) -> np.ndarray:
    """Decode png/jpeg bytes -> (H, W, channels) uint8."""
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    if channels == 3:
        img = img.convert("RGB")
    elif channels == 1:
        img = img.convert("L")
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def decode_png16(data: bytes) -> np.ndarray:
    """Decode 16-bit grayscale PNG (NYUv2 depth maps) -> (H, W, 1) uint16."""
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr.astype(np.uint16)


def resize_bilinear(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear resize of (H, W, C) uint8/float -> (height, width, C).

    Float inputs are resized per-channel in PIL 'F' mode (PIL has no
    multi-channel float images)."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if np.issubdtype(arr.dtype, np.floating):
        chans = [np.asarray(Image.fromarray(arr[:, :, c].astype(np.float32),
                                            mode="F")
                            .resize((width, height), Image.BILINEAR))
                 for c in range(arr.shape[-1])]
        return np.stack(chans, axis=-1).astype(arr.dtype)
    squeeze = arr.shape[-1] == 1
    a2 = arr[:, :, 0] if squeeze else arr
    out = np.asarray(Image.fromarray(a2).resize((width, height), Image.BILINEAR))
    if squeeze:
        out = out[:, :, None]
    return out


def encode_png_bytes(img: np.ndarray) -> bytes:
    from hemx.summaries.png import encode_png
    return encode_png(np.asarray(img, np.uint8))
