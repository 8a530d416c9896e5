"""Fréchet Inception Distance machinery.

BASELINE.json names "FID parity" as a sample-quality target. The reference
itself never computed FID (SURVEY.md §6: no FID/IS numbers exist), so hemx
provides the complete machinery with a pluggable feature extractor:

* ``frechet_distance(mu1, sigma1, mu2, sigma2)`` — the exact Fréchet
  distance between two Gaussians (matrix sqrt via eigendecomposition of the
  symmetrized product; jit-safe);
* ``gaussian_stats(features)`` — mean/covariance of a feature batch;
* ``fid_from_features`` / ``fid_from_images`` — end-to-end helpers.

The canonical extractor is InceptionV3-pool3. This environment has no
network access and no bundled Inception weights, so ``fid_from_images``
takes any callable ``images -> features``; pass an Inception forward where
weights are available, or use ``pixel_features`` /
``encoder_features(model, ts)`` (a trained hemx encoder) for relative
comparisons between runs. Absolute numbers are only comparable when both
sides use the same extractor.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_stats(features) -> tuple[np.ndarray, np.ndarray]:
    """(mean, covariance) of (N, D) features."""
    f = np.asarray(features, np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a (near-)PSD symmetric matrix."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FID between N(mu1, sigma1) and N(mu2, sigma2):
    |mu1-mu2|^2 + tr(s1 + s2 - 2 (s1 s2)^(1/2))."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    s1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    s2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    diff = mu1 - mu2
    # sqrt(s1 s2) computed stably as sqrt(sqrt(s1) s2 sqrt(s1))
    rs1 = _sqrtm_psd(s1)
    covmean = _sqrtm_psd(rs1 @ s2 @ rs1)
    return float(diff @ diff + np.trace(s1) + np.trace(s2)
                 - 2.0 * np.trace(covmean))


def fid_from_features(real_features, fake_features) -> float:
    mu1, s1 = gaussian_stats(real_features)
    mu2, s2 = gaussian_stats(fake_features)
    return frechet_distance(mu1, s1, mu2, s2)


def pixel_features(images, size: int = 8):
    """Cheap extractor: downsampled pixels. Only meaningful for RELATIVE
    comparisons between models on the same data."""
    x = jnp.asarray(images)
    n, h, w, c = x.shape
    fh, fw = h // size, w // size
    x = x[:, :fh * size, :fw * size, :]
    x = x.reshape(n, size, fh, size, fw, c).mean(axis=(2, 4))
    return np.asarray(x.reshape(n, -1))


def encoder_features(model, ts) -> Callable:
    """Feature extractor from a trained hemx model's encoder (captures the
    bottleneck activation). Works for cnn/vae-style models with ._net."""
    from hemx.core import Ctx

    def extract(images):
        ctx = Ctx(training=False, rng=jax.random.PRNGKey(0), capture=True)
        x = jnp.asarray(images)
        # go through the model's own forward (cnn._forward rescales [0,1]
        # inputs to the [-1,1] the encoder was trained on); raw _net.apply
        # would feed a distribution the encoder never saw
        if hasattr(model, "_forward"):
            model._forward(ts["params"], ts["mstate"], x, ctx)
        else:
            model._net.apply(ts["params"], ts["mstate"], x, ctx)
        feats = ctx.intermediates.get("latent")
        if feats is None:
            named = [k for k in ctx.intermediates if "latent" in k]
            if not named:
                raise ValueError(
                    "encoder_features: no 'latent' intermediate captured; "
                    f"available: {sorted(ctx.intermediates)}")
            feats = ctx.intermediates[named[0]]
        f = np.asarray(jax.device_get(feats))
        return f.reshape(f.shape[0], -1)

    return extract


def fid_from_images(real_images, fake_images,
                    extractor: Callable = pixel_features) -> float:
    return fid_from_features(extractor(real_images), extractor(fake_images))
