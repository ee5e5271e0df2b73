"""Image post-processing pipeline for dataset generation.

Pure-JAX re-design of the reference fireflies/postprocessing/* (numpy /
kornia / cv2 there): every processor is `apply(key, image) -> image`, fired
with probability `p` via masking (so a whole augmentation pipeline jits and
vmaps across a dataset batch — the reference applies them serially per frame,
main.py:158-159).

Images are (H, W) or (H, W, C) float arrays in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


class PostProcessor:
    """Sequential pipeline (reference postprocessing/postprocessor.py)."""

    def __init__(self, functions: list):
        self._functions = list(functions)

    def post_process(self, key: Array, image: Array) -> Array:
        for i, fn in enumerate(self._functions):
            image = fn.apply(jax.random.fold_in(key, i), image)
        return image

    apply = post_process


class BasePostProcessingFunction:
    """Stochastic gate: runs `post_process` with probability p
    (reference postprocessing/base.py:10-17)."""

    def __init__(self, probability: float = 1.0):
        self._probability = float(probability)

    def apply(self, key: Array, image: Array) -> Array:
        k_gate, k_fn = jax.random.split(key)
        fire = jax.random.uniform(k_gate, ()) < self._probability
        processed = self.post_process(k_fn, image)
        return jnp.where(fire, processed, image)

    def post_process(self, key: Array, image: Array) -> Array:
        raise NotImplementedError


class WhiteNoise(BasePostProcessingFunction):
    """Additive gaussian sensor noise, clipped to [0, 1]
    (reference white_noise.py: N(mean, std))."""

    def __init__(self, mean: float = 0.0, std: float = 0.05, probability: float = 1.0):
        super().__init__(probability)
        self._mean = float(mean)
        self._std = float(std)

    def post_process(self, key: Array, image: Array) -> Array:
        noise = self._mean + self._std * jax.random.normal(key, image.shape)
        return jnp.clip(image + noise, 0.0, 1.0)


def gaussian_kernel_1d(size: int, sigma: float) -> Array:
    half = (size - 1) / 2.0
    x = jnp.arange(size, dtype=jnp.float32) - half
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def gaussian_blur2d(image: Array, kernel_size=(3, 3), sigma=(1.0, 1.0)) -> Array:
    """Separable gaussian blur on (H, W[, C]) (replaces kornia
    gaussian_blur2d, reference gauss_blur.py:20)."""
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    kh = gaussian_kernel_1d(int(kernel_size[0]), float(sigma[0]))
    kw = gaussian_kernel_1d(int(kernel_size[1]), float(sigma[1]))
    pad_h = (len(kh) - 1) // 2
    pad_w = (len(kw) - 1) // 2
    # Reflect padding (kornia's default) keeps border energy.
    padded = jnp.pad(image, ((pad_h, pad_h), (pad_w, pad_w), (0, 0)), mode="reflect")
    x = jnp.moveaxis(padded, -1, 0)[None]  # NCHW
    c = x.shape[1]
    kern_h = jnp.tile(kh.reshape(1, 1, -1, 1), (c, 1, 1, 1))
    kern_w = jnp.tile(kw.reshape(1, 1, 1, -1), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kern_h.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, kern_h, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    x = jax.lax.conv_general_dilated(
        x, kern_w, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    out = jnp.moveaxis(x[0], 0, -1)
    return out[..., 0] if squeeze else out


class GaussianBlur(BasePostProcessingFunction):
    """Optical blur (reference gauss_blur.py; main.py uses
    GaussianBlur((3, 3), (5, 5), 0.5))."""

    def __init__(self, kernel_size=(3, 3), sigma=(5.0, 5.0), probability: float = 1.0):
        super().__init__(probability)
        self._kernel_size = tuple(int(k) for k in kernel_size)
        self._sigma = tuple(float(s) for s in sigma)

    def post_process(self, key: Array, image: Array) -> Array:
        return gaussian_blur2d(image, self._kernel_size, self._sigma)


class ApplySilhouette(BasePostProcessingFunction):
    """Endoscope circular-vignette sim (reference apply_silhouette.py):
    a randomly placed bright circle (blurred) multiplied onto the image.

    The reference hard-codes pixel ranges for ~512^2 images (center x in
    [100, 200], y in [200, 300], radius in [170, 230]); here the same
    proportions scale with image size.
    """

    def __init__(
        self,
        center_x_range=(0.195, 0.39),
        center_y_range=(0.39, 0.586),
        radius_range=(0.33, 0.45),
        blur_sigma: float = 5.0,
        probability: float = 1.0,
    ):
        super().__init__(probability)
        self._cx = center_x_range
        self._cy = center_y_range
        self._r = radius_range
        self._blur_sigma = float(blur_sigma)

    def post_process(self, key: Array, image: Array) -> Array:
        h = image.shape[0]
        w = image.shape[1]
        k1, k2, k3 = jax.random.split(key, 3)
        cx = jax.random.uniform(k1, (), minval=self._cx[0], maxval=self._cx[1]) * w
        cy = jax.random.uniform(k2, (), minval=self._cy[0], maxval=self._cy[1]) * h
        r = jax.random.uniform(k3, (), minval=self._r[0], maxval=self._r[1]) * max(h, w)
        gy, gx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
        )
        mask = ((gx - cx) ** 2 + (gy - cy) ** 2 <= r * r).astype(jnp.float32)
        ks = max(int(self._blur_sigma) * 2 + 1, 3)
        mask = gaussian_blur2d(mask, (ks, ks), (self._blur_sigma, self._blur_sigma))
        if image.ndim == 3:
            mask = mask[..., None]
        return image * mask


__all__ = [
    "PostProcessor",
    "BasePostProcessingFunction",
    "WhiteNoise",
    "GaussianBlur",
    "ApplySilhouette",
    "gaussian_blur2d",
]
