"""On-device 2D augmentation — the torchvision/PIL stack as jit-compiled JAX.

Reference pipeline (``data.py:14-44`` + ``chestDataset.py:31-48``), per image:

* 2 global views: RandomResizedCrop(224, scale (0.3, 1)) → RandomRotation(10)
  → RandomHorizontalFlip
* 6 local views: RandomResizedCrop(96, scale (0.05, 0.3)) → rot10 → hflip
* clean normalized copies of the global views are kept as restoration GT
  *before* intensity corruption (``chestDataset.py:37-40``)
* corruption: RandomGrayscale(0.2) → GaussianBlur(σ∈[0.1,2], p=0.5) →
  ColorJitter(0.4×4) → Normalize(ImageNet) → Cutout(3 holes, 32px; globals
  only, ``data.py:44``)

The host feeds a fixed-size float canvas (decoded image resized to
``canvas×canvas``); every random view is cut on device with
``jax.image.scale_and_translate`` (dynamic scale/translation + antialiasing —
the PIL-resize-equivalent primitive), so one H2D transfer serves all 8 views.

Documented deviations from torchvision (loss-curve-level, not bit-level):
* ColorJitter sub-ops run in fixed order brightness→contrast→saturation→hue
  (torchvision shuffles the order per call).
* Crops are cut from the fixed canvas rather than the native-resolution file;
  set ``canvas`` to the native size for full fidelity.

Layout: every op here works CHANNELS-FIRST (C, H, W).  With channels last,
each elementwise pass puts C=3 on the 128-lane axis — ~42x register/memory
padding on TPU; CHW puts W on the lanes instead (measured: the full aug
program dropped 96 -> ~20 ms at b=64).  ``make_chest_aug_fn`` transposes at
the batch boundary, so the external contract stays NHWC.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.scipy.ndimage import map_coordinates

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


# ---------------------------------------------------------------------------
# spatial
# ---------------------------------------------------------------------------


def sample_resized_crop_box(key, img_hw, scale, ratio=(3.0 / 4.0, 4.0 / 3.0),
                            attempts: int = 10):
    """torchvision ``RandomResizedCrop.get_params``: rejection-sample (i, j, h, w).

    Static ``attempts`` tries, first valid wins; fallback is the torchvision
    center crop clamped to the valid aspect range.
    """
    h_img, w_img = img_hw
    area = h_img * w_img
    keys = jax.random.split(key, 3)
    target_area = area * jax.random.uniform(
        keys[0], (attempts,), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        keys[1], (attempts,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    w = jnp.sqrt(target_area * aspect)
    h = jnp.sqrt(target_area / aspect)
    valid = (w <= w_img) & (h <= h_img) & (w >= 1) & (h >= 1)
    # torchvision rounds sizes then samples integer corners; we keep floats
    # (continuous corners) — sub-pixel difference only.
    u = jax.random.uniform(keys[2], (2, attempts))
    i = u[0] * (h_img - h)
    j = u[1] * (w_img - w)

    first = jnp.argmax(valid)  # index of first True (0 if none)
    any_valid = jnp.any(valid)

    # fallback: aspect-clamped center crop (torchvision lines after the loop)
    in_ratio = w_img / h_img
    fw = jnp.where(in_ratio < ratio[0], w_img,
                   jnp.where(in_ratio > ratio[1], h_img * ratio[1], w_img))
    fh = jnp.where(in_ratio < ratio[0], w_img / ratio[0],
                   jnp.where(in_ratio > ratio[1], h_img, h_img))
    fi = (h_img - fh) / 2.0
    fj = (w_img - fw) / 2.0

    box_i = jnp.where(any_valid, i[first], fi)
    box_j = jnp.where(any_valid, j[first], fj)
    box_h = jnp.where(any_valid, h[first], fh)
    box_w = jnp.where(any_valid, w[first], fw)
    return box_i, box_j, box_h, box_w


def _resize_matrix(out_n: int, in_n: int, scale, translation) -> jax.Array:
    """The 1-D linear+antialias resize operator as an (out_n, in_n) matrix —
    ``jax.image.scale_and_translate`` semantics: output o samples input at
    ``(o + 0.5 − translation)/scale − 0.5`` with a triangle kernel widened by
    1/scale when downscaling (verified ≤1e-5 against jax.image)."""
    o = jnp.arange(out_n, dtype=jnp.float32)
    x = (o + 0.5 - translation) / scale - 0.5
    i = jnp.arange(in_n, dtype=jnp.float32)
    s = jnp.minimum(scale, 1.0)
    d = (i[None, :] - x[:, None]) * s
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)


def crop_and_resize(img: jax.Array, box, out_size: int) -> jax.Array:
    """Resize the (i, j, h, w) box of CHW ``img`` to ``out_size²`` with a
    linear antialiasing filter (PIL-resize equivalent).

    Implemented as two explicit matmuls against banded resize operators —
    on TPU this runs on the MXU ~8× faster than
    ``jax.image.scale_and_translate``'s lowering at these shapes, with
    identical numerics.
    """
    i, j, h, w = box
    scale = jnp.array([out_size / h, out_size / w])
    translation = -jnp.array([i, j]) * scale
    wh = _resize_matrix(out_size, img.shape[1], scale[0], translation[0])
    ww = _resize_matrix(out_size, img.shape[2], scale[1], translation[1])
    t = jnp.einsum("oh,chw->cow", wh, img)
    return jnp.einsum("pw,cow->cop", ww, t)


def _rotate_exact(img: jax.Array, theta) -> jax.Array:
    """Gather-based nearest rotation (torchvision ``RandomRotation`` default
    semantics).  Slow on TPU — the golden path for parity tests."""
    h, w = img.shape[1], img.shape[2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    src_y = cos * (yy - cy) - sin * (xx - cx) + cy
    src_x = sin * (yy - cy) + cos * (xx - cx) + cx
    out = jax.vmap(
        lambda ch: map_coordinates(ch, [src_y, src_x], order=0,
                                   mode="constant", cval=0.0),
        in_axes=0, out_axes=0)(img)
    return out


def _unit_shear(img: jax.Array, axis: int, lam, max_shift: int) -> jax.Array:
    """Resample axis ``axis`` at ``x_k + λ·(x_j − c_j)`` (centered unit shear,
    linear interp, zero fill) without gathers.

    The integer part of the per-line shift is applied as BIT-DECOMPOSED
    conditional rolls: roll the whole image by 2^b and select it per line
    where bit b of (shift + max_shift) is set — ``log2`` passes instead of
    one masked pass per possible shift (the previous masked-sum formulation
    cost ~100 array passes per shear at 224²; this one ~16, measured ~4×
    faster end-to-end).  Rolls wrap, so source positions outside the extent
    are zeroed per interpolation tap at the end (same semantics).
    """
    n_k = img.shape[1 + axis]
    n_j = img.shape[2 - axis]
    c_j = (n_j - 1) / 2.0
    jc = jnp.arange(n_j, dtype=jnp.float32) - c_j
    t = lam * jc                                   # shift per line
    s = jnp.floor(t)
    f = (t - s)
    if axis == 0:          # shift along y, per x-column
        shape = (1, 1, n_j)
        i_idx = jnp.arange(n_k).reshape(1, n_k, 1)
    else:                  # shift along x, per y-row
        shape = (1, n_j, 1)
        i_idx = jnp.arange(n_k).reshape(1, 1, n_k)
    f_l = f.reshape(shape)
    s_l = s.reshape(shape)

    roll_axis = 1 + axis
    # out[o] should read img[o + s]; start from the common -max_shift offset
    # so the remaining per-line shift (s + max_shift) is non-negative
    cur = jnp.roll(img, max_shift, axis=roll_axis)
    sh = (s + max_shift).astype(jnp.int32).reshape(shape)
    b = 1
    while b <= 2 * max_shift + 1:
        rolled = jnp.roll(cur, -b, axis=roll_axis)
        cur = jnp.where((sh & b) != 0, rolled, cur)
        b <<= 1
    nxt = jnp.roll(cur, -1, axis=roll_axis)

    src = i_idx.astype(jnp.float32) + s_l
    v0 = jnp.where((src >= 0) & (src <= n_k - 1), cur, 0.0)
    v1 = jnp.where((src + 1 >= 0) & (src + 1 <= n_k - 1), nxt, 0.0)
    return (1.0 - f_l) * v0 + f_l * v1


def _rotate_shear(img: jax.Array, theta, degrees: float) -> jax.Array:
    """Rotation as 3 unit shears — R(θ) = Shy(−tan θ/2)·Shx(sin θ)·
    Shy(−tan θ/2) — each a roll-sum (see ``_unit_shear``).

    Linear interpolation (the exact path is nearest, torchvision's default);
    documented deviation, agreement tested geometrically and to a tolerance
    bounded by the nearest-vs-linear difference.
    """
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    h, w = img.shape[1], img.shape[2]
    rad = degrees * np.pi / 180.0
    m_yx = int(np.ceil(np.tan(rad / 2) * ((w - 1) / 2))) + 1
    m_xy = int(np.ceil(np.sin(rad) * ((h - 1) / 2))) + 1
    img = _unit_shear(img, 0, a, m_yx)   # y += a·(x−cx)
    img = _unit_shear(img, 1, b, m_xy)   # x += b·(y−cy)
    img = _unit_shear(img, 0, a, m_yx)
    return img


def rotate_impl() -> str:
    """``"shear"`` (default, roll-sum passes) or ``"exact"`` (nearest gather,
    the torchvision-parity golden path).  Select with ``PCRL_ROTATE=exact``."""
    import os

    return os.environ.get("PCRL_ROTATE", "shear").lower()


def random_rotate(key, img: jax.Array, degrees: float = 10.0,
                  impl: str | None = None) -> jax.Array:
    """torchvision ``RandomRotation(10)``: no expand, zero fill, rotation
    about the image center.  Two backends share the sampled angle (see
    ``rotate_impl``)."""
    angle = jax.random.uniform(key, (), minval=-degrees, maxval=degrees)
    theta = angle * jnp.pi / 180.0
    if (impl or rotate_impl()) == "exact":
        return _rotate_exact(img, theta)
    return _rotate_shear(img, theta, degrees)


def random_hflip(key, img: jax.Array, p: float = 0.5) -> jax.Array:
    return jnp.where(jax.random.bernoulli(key, p), jnp.flip(img, axis=2), img)


def spatial_view(key, img, img_hw, out_size: int, scale) -> jax.Array:
    """One random view: resized-crop → rotate → hflip (``data.py:19-29``)."""
    k1, k2, k3 = jax.random.split(key, 3)
    box = sample_resized_crop_box(k1, img_hw, scale)
    v = crop_and_resize(img, box, out_size)
    v = random_rotate(k2, v)
    return random_hflip(k3, v)


# ---------------------------------------------------------------------------
# intensity
# ---------------------------------------------------------------------------


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """ITU-R 601-2 luma (PIL ``convert('L')`` / torchvision grayscale)."""
    return (0.299 * img[0] + 0.587 * img[1] + 0.114 * img[2])


def random_grayscale(key, img, p: float = 0.2):
    g = rgb_to_gray(img)[None]
    return jnp.where(jax.random.bernoulli(key, p),
                     jnp.broadcast_to(g, img.shape), img)


def gaussian_blur_2d(img: jax.Array, sigma) -> jax.Array:
    """Separable Gaussian blur, edge padding (PIL ``ImageFilter.GaussianBlur``
    with radius=σ, reference ``utils.py:139-148``)."""
    from pcrlv2_tpu.ops.blur import blur_axis, gaussian_kernel

    w = gaussian_kernel(sigma)
    return blur_axis(blur_axis(img, w, 1, "edge"), w, 2, "edge")


def random_blur_2d(key, img, sigma_range=(0.1, 2.0), p: float = 0.5):
    ks, kp = jax.random.split(key)
    sigma = jax.random.uniform(ks, (), minval=sigma_range[0],
                               maxval=sigma_range[1])
    return jnp.where(jax.random.bernoulli(kp, p),
                     gaussian_blur_2d(img, sigma), img)


def _rgb_to_hsv(img):
    r, g, b = img[0], img[1], img[2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=0)


def color_jitter(key, img, brightness=0.4, contrast=0.4, saturation=0.4,
                 hue=0.4):
    """torchvision ``ColorJitter(0.4, 0.4, 0.4, 0.4)`` (``data.py:33``), fixed
    op order (documented deviation — torchvision shuffles)."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    img = jnp.clip(img * fb, 0.0, 1.0)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast),
                            maxval=1 + contrast)
    mean = jnp.mean(rgb_to_gray(img))
    img = jnp.clip((img - mean) * fc + mean, 0.0, 1.0)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation),
                            maxval=1 + saturation)
    gray = rgb_to_gray(img)[None]
    img = jnp.clip((img - gray) * fs + gray, 0.0, 1.0)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    h, s, v = _rgb_to_hsv(img)
    img = _hsv_to_rgb((h + fh) % 1.0, s, v)
    return jnp.clip(img, 0.0, 1.0)


def normalize_imagenet(img):
    return (img - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]


def cutout(key, img, n_holes: int = 3, length: int = 32):
    """Reference ``Cutout`` (``utils.py:60-98``): square holes centered at
    uniform pixels, clipped at borders, zeroing *normalized* values."""
    h, w = img.shape[1], img.shape[2]
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    mask = jnp.ones((h, w), jnp.float32)
    keys = jax.random.split(key, n_holes)
    for k in keys:
        cy = jax.random.randint(k, (), 0, h)
        cx = jax.random.randint(jax.random.fold_in(k, 1), (), 0, w)
        hole = ((yy >= cy - length // 2) & (yy < cy + length // 2)
                & (xx >= cx - length // 2) & (xx < cx + length // 2))
        mask = mask * (1.0 - hole.astype(jnp.float32))
    return img * mask[None]


def corrupt_view(key, img, with_cutout: bool):
    """RandomGrayscale → blur(p=.5) → ColorJitter → Normalize [→ Cutout]
    (reference ``data.py:30-44``)."""
    kg, kb, kj, kc = jax.random.split(key, 4)
    img = random_grayscale(kg, img)
    img = random_blur_2d(kb, img)
    img = color_jitter(kj, img)
    img = normalize_imagenet(img)
    if with_cutout:
        img = cutout(kc, img)
    return img


# ---------------------------------------------------------------------------
# batch-level aug fn
# ---------------------------------------------------------------------------


def _augment_one_2d(key, img, hw, n_local: int, global_size: int,
                    local_size: int):
    """Per-image pipeline of ``Pcrlv2ChestPretask.__getitem__``
    (reference ``chestDataset.py:31-48``)."""
    keys = jax.random.split(key, 4 + 2 * n_local)
    img = jnp.transpose(img, (2, 0, 1))  # CHW for the whole pipeline
    y1 = spatial_view(keys[0], img, hw, global_size, (0.3, 1.0))
    y2 = spatial_view(keys[1], img, hw, global_size, (0.3, 1.0))
    gt1 = normalize_imagenet(y1)
    gt2 = normalize_imagenet(y2)
    x1 = corrupt_view(keys[2], y1, with_cutout=True)
    x2 = corrupt_view(keys[3], y2, with_cutout=True)

    def local_view(ks, kc):
        v = spatial_view(ks, img, hw, local_size, (0.05, 0.3))
        return corrupt_view(kc, v, with_cutout=False)

    locals_out = jax.vmap(local_view)(keys[4:4 + n_local],
                                      keys[4 + n_local:4 + 2 * n_local])
    hwc = lambda v: jnp.transpose(v, (1, 2, 0))
    return (hwc(x1), hwc(x2), hwc(gt1), hwc(gt2),
            jnp.transpose(locals_out, (0, 2, 3, 1)))


def make_chest_aug_fn(n_local: int = 6, global_size: int = 224,
                      local_size: int = 96):
    """Build the batch aug fn for the 2D pipeline.

    Input batch: ``{'image': (B, canvas, canvas, C)}`` — decoded images on a
    fixed square canvas host-side.  Accepts float in [0,1] (legacy) or uint8
    (production: 4x fewer H2D bytes), C=3 (RGB) or C=1 (grayscale sources,
    e.g. NIH — replicated to 3 on device: another 3x fewer H2D bytes).
    Output views match ``chestDataset.py:48``: x1/x2/gt/gt2
    (B, 224, 224, 3) and locals (B, 6, 96, 96, 3), ImageNet-normalized.

    **Deviation:** the reference crops at native resolution on CPU workers;
    the fixed square canvas aspect-distorts non-square X-rays (NIH images
    are 1024² so this is a no-op there).  For non-square datasets set
    ``canvas`` to the native size in the host loader.
    """

    def aug_fn(key, batch):
        imgs = batch["image"]
        if imgs.dtype == jnp.uint8:
            # divide (not *1/255): bit-parity with the legacy host-side
            # np.float32(arr)/255.0 path
            imgs = imgs.astype(jnp.float32) / 255.0
        else:
            imgs = imgs.astype(jnp.float32)
        if imgs.shape[-1] == 1:  # grayscale source → RGB on device
            imgs = jnp.broadcast_to(imgs, imgs.shape[:-1] + (3,))
        b, h0, w0 = imgs.shape[:3]
        hw = jnp.broadcast_to(jnp.array([h0, w0], jnp.float32), (b, 2))
        keys = jax.random.split(key, b)
        fn = partial(_augment_one_2d, n_local=n_local,
                     global_size=global_size, local_size=local_size)
        x1, x2, gt1, gt2, locals_out = jax.vmap(fn)(keys, imgs, hw)
        return {"x1": x1, "x2": x2, "gt": gt1, "gt2": gt2,
                "locals": locals_out}

    return aug_fn
