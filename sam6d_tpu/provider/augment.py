"""Color augmentation for training crops (numpy, no imgaug).

Re-derivation of the reference's gdrnpp/cosypose augmentation chain
(provider/training_dataset.py:81-99): each op applies with its own
probability in random order — coarse dropout, blur, sharpness, contrast,
brightness, color, additive offsets, channel inversion, multiplicative
noise, gaussian noise, linear contrast, grayscale blend.

Parameter parity: imgaug's pillike.Enhance* ops wrap PIL.ImageEnhance
with IDENTICAL factor semantics, so the reference's ranges carry over
unchanged (sharpness 0-50, contrast 0.2-50, brightness 0.1-6, color
0-20 — extreme factors saturate in PIL exactly as they do under
imgaug).  `per_channel=p` in imgaug means "with probability p, draw a
separate value per channel, else one shared value" — reproduced below.
LinearContrast pivots at 127 (imgaug's fixed center, not the image
mean); Grayscale mixes with ITU-R 601 luma weights.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter


def _pil(img):
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))


def color_augment(rng: np.random.RandomState, img: np.ndarray) -> np.ndarray:
    """Augment a uint8 (H, W, 3) crop."""
    img = img.astype(np.float32)

    ops = []

    def op(prob, fn):
        ops.append((prob, fn))

    def _per_channel(prob_pc, lo, hi):
        """imgaug per_channel semantics: with prob_pc draw per channel,
        otherwise one shared draw."""
        if rng.rand() < prob_pc:
            return rng.uniform(lo, hi, (1, 1, 3))
        return np.full((1, 1, 3), rng.uniform(lo, hi), np.float32)

    op(0.5, lambda x: _coarse_dropout(rng, x, p=0.2, size_percent=0.05))
    op(0.4, lambda x: np.asarray(
        _pil(x).filter(ImageFilter.GaussianBlur(rng.uniform(0, 3))),
        np.float32))
    op(0.3, lambda x: np.asarray(
        ImageEnhance.Sharpness(_pil(x)).enhance(rng.uniform(0, 50)),
        np.float32))
    op(0.3, lambda x: np.asarray(
        ImageEnhance.Contrast(_pil(x)).enhance(rng.uniform(0.2, 50)),
        np.float32))
    op(0.5, lambda x: np.asarray(
        ImageEnhance.Brightness(_pil(x)).enhance(rng.uniform(0.1, 6)),
        np.float32))
    op(0.3, lambda x: np.asarray(
        ImageEnhance.Color(_pil(x)).enhance(rng.uniform(0, 20)),
        np.float32))
    op(0.5, lambda x: x + _per_channel(0.3, -25, 25))
    op(0.3, lambda x: _invert_channels(rng, x, p=0.2))
    op(0.5, lambda x: x * _per_channel(0.5, 0.6, 1.4))
    op(0.5, lambda x: x * rng.uniform(0.6, 1.4))
    op(0.1, lambda x: x + rng.randn(*x.shape) * 10)
    op(0.5, lambda x: 127.0 + (x - 127.0) * _per_channel(0.3, 0.5, 2.2))
    op(0.5, lambda x: _grayscale_blend(rng, x))

    order = rng.permutation(len(ops))
    for i in order:
        prob, fn = ops[i]
        if rng.rand() < prob:
            img = np.clip(fn(img), 0, 255).astype(np.float32)
    return img.astype(np.uint8)


def _coarse_dropout(rng, img, p=0.2, size_percent=0.05):
    H, W = img.shape[:2]
    gh = max(1, int(H * size_percent))
    gw = max(1, int(W * size_percent))
    drop = rng.rand(gh, gw) < p
    drop_full = np.asarray(
        Image.fromarray((drop * 255).astype(np.uint8)).resize(
            (W, H), Image.NEAREST
        )
    ) > 127
    out = img.copy()
    out[drop_full] = 0
    return out


def _invert_channels(rng, img, p=0.2):
    out = img.copy()
    for c in range(3):
        if rng.rand() < p:
            out[..., c] = 255 - out[..., c]
    return out


def _grayscale_blend(rng, img):
    alpha = rng.uniform(0, 1)
    # ITU-R 601 luma (imgaug Grayscale), not a plain channel mean.
    gray = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]
    return (1 - alpha) * img + alpha * gray
