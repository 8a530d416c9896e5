"""Synthetic in-memory dataset for tests and benchmarks.

Not in the reference; exists so every model can be exercised end-to-end with
no downloads (the reference's datasets all require network or manual prep).
Produces deterministic pseudo-images in [0,1] plus a synthetic depth channel
so image->depth models (the NYUv2 consumers) run too.
"""

from __future__ import annotations

import numpy as np

from hemx.data.pipeline import ArraySource, Split, u8_image_device_transform
from hemx.data.plugin import DataPlugin


def _make_images(n: int, h: int, w: int, c: int, seed: int,
                 blobs: int = 5, chunk: int = 2048) -> np.ndarray:
    """Structured scenes: a linear-gradient background plus ``blobs`` soft
    elliptical blobs with random position/size/orientation/color.

    ~`4c + 8*blobs` degrees of freedom per image (≈52 for RGB) — well under
    a 200-dim bottleneck, so autoencoders can genuinely compress and GANs
    have a low-dimensional manifold to model. (The round-1 generator was a
    per-image random field with ~768 iid dof: a latent-200 AE could do no
    better than the dataset mean image, which made convergence-parity runs
    vacuous.)
    """
    rng = np.random.default_rng(seed)
    yy = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
    xx = np.linspace(0.0, 1.0, w, dtype=np.float32)[None, :]
    out = np.empty((n, h, w, c), np.float32)
    for s in range(0, n, chunk):
        m = min(chunk, n - s)
        g0 = rng.uniform(0.25, 0.75, (m, 1, 1, c)).astype(np.float32)
        gx = rng.uniform(-0.4, 0.4, (m, 1, 1, c)).astype(np.float32)
        gy = rng.uniform(-0.4, 0.4, (m, 1, 1, c)).astype(np.float32)
        img = g0 + gx * xx[None, :, :, None] + gy * yy[None, :, :, None]
        for _ in range(blobs):
            cx = rng.uniform(0.1, 0.9, (m, 1, 1)).astype(np.float32)
            cy = rng.uniform(0.1, 0.9, (m, 1, 1)).astype(np.float32)
            rx = rng.uniform(0.06, 0.25, (m, 1, 1)).astype(np.float32)
            ry = rng.uniform(0.06, 0.25, (m, 1, 1)).astype(np.float32)
            th = rng.uniform(0.0, np.pi, (m, 1, 1)).astype(np.float32)
            col = rng.uniform(-0.8, 0.8, (m, c)).astype(np.float32)
            dx = xx[None] - cx
            dy = yy[None] - cy
            u = (np.cos(th) * dx + np.sin(th) * dy) / rx
            v = (-np.sin(th) * dx + np.cos(th) * dy) / ry
            blob = np.exp(-(u * u + v * v))
            img += blob[..., None] * col[:, None, None, :]
        out[s:s + m] = np.clip(img, 0.0, 1.0)
    return out


class SyntheticDataset(DataPlugin):
    name = "synthetic"

    @staticmethod
    def arguments() -> dict:
        return {
            "--synthetic_count": dict(type=int, default=1024,
                                      help="Samples in the train split."),
            "--synthetic_shape": dict(type=int, nargs=3, default=[64, 64, 3],
                                      help="H W C of generated images."),
            "--synthetic_eval_count": dict(
                type=int, default=0,
                help="Samples in validate/test splits (0 = same as "
                     "--synthetic_count)."),
            "--synthetic_u8": dict(
                action="store_true", default=False,
                help="Store image/depth as uint8 and normalize on-device "
                     "(the real-dataset path: compact host cache, uint8 over "
                     "the H2D link, u8_normalize on-chip). Default "
                     "float32 keeps exact [0,1] values for numeric tests."),
        }

    @staticmethod
    def check_prepared_datasets(storage_dir: str) -> bool:
        return True  # generated on the fly

    @staticmethod
    def check_raw_datasets(storage_dir: str) -> bool:
        return True

    @staticmethod
    def download(download_dir: str) -> bool:
        return True

    @staticmethod
    def convert_to_tfrecord(download_dir: str, storage_dir: str) -> None:
        pass

    @classmethod
    def get_datasets(cls, args) -> dict:
        n_train = getattr(args, "synthetic_count", 1024)
        n_eval = getattr(args, "synthetic_eval_count", 0) or n_train
        u8 = getattr(args, "synthetic_u8", False)
        h, w, c = getattr(args, "synthetic_shape", [64, 64, 3])
        splits = {}
        ys = np.linspace(0.0, 1.0, h, dtype=np.float32)
        xs = np.linspace(0.0, 1.0, w, dtype=np.float32)
        for i, split in enumerate(("train", "validate", "test")):
            n = n_train if split == "train" else n_eval
            images = _make_images(n, h, w, c, seed=args.seed + i)
            depth = images.mean(axis=3, keepdims=True) * 0.9 + 0.05
            # NYUv2-style auxiliary channels so location/mean-conditioned
            # models (improved_sampler C1/D1/E1, paper variants) run here
            # too. Broadcast views: zero extra host memory; fancy indexing
            # in ArraySource.batch materializes per-batch copies.
            y_loc = np.broadcast_to(ys[None, :, None, None], (n, h, w, 1))
            x_loc = np.broadcast_to(xs[None, None, :, None], (n, h, w, 1))
            mean = np.broadcast_to(depth.mean(axis=(1, 2, 3), keepdims=True),
                                   depth.shape)
            if u8:
                images = np.round(images * 255.0).astype(np.uint8)
                depth = np.round(depth * 255.0).astype(np.uint8)
            src = ArraySource({"image": images, "depth": depth,
                               "x_loc": x_loc, "y_loc": y_loc, "mean": mean})
            dt = (u8_image_device_transform(keys=("image", "depth"))
                  if u8 else None)
            splits[split] = Split(src, name=split, device_transform=dt)
        return splits
