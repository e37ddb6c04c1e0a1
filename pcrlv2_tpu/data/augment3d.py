"""On-device 3D augmentation — the torchio stack as jit-compiled JAX.

The reference corrupts each sample on CPU dataloader workers with torchio
(reference ``data.py:73-89``):

* spatial (both views + GT): ``RandomFlip()`` + ``RandomAffine()``
* global intensity: ``RandomBlur()`` → ``RandomNoise()`` → ``RandomGamma()``
  → ``RandomSwap(patch_size=(8,4,4))`` → ``ZNormalization()``
* local intensity: same minus the swap

and keeps the spatially-augmented, *uncorrupted* copy as restoration GT
(``lunaDataset.py:37-42``).  Here the loader feeds raw crops and everything
runs inside the jitted train step, vmapped per sample with split PRNG keys —
this removes the CPU-worker bottleneck the reference pays for (SURVEY.md §7).

Parameter ranges mirror torchio defaults:

* RandomFlip: axes=(0,), p=0.5
* RandomAffine: per-axis scales U(0.9, 1.1), per-axis rotations U(−10°, 10°),
  no translation, linear resampling, minimum-value padding (torchio pads with
  a border estimate; we use the volume minimum — documented approximation)
* RandomBlur: per-axis Gaussian σ ~ U(0, 2) (scipy ``gaussian_filter``
  semantics, reflect padding, truncate≈4 via a fixed 17-tap kernel)
* RandomNoise: additive Gaussian, μ=0, σ ~ U(0, 0.25)
* RandomGamma: γ = exp(U(−0.3, 0.3)), sign-preserving power
* RandomSwap: 100 iterations of swapping two random (8,4,4) patches
* ZNormalization: (x − mean)/std over the whole volume (unbiased std)

All functions take a single sample (X, Y, Z) and a key; ``make_luna_aug_fn``
vmaps them over the batch.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.ndimage import map_coordinates

# ---------------------------------------------------------------------------
# spatial
# ---------------------------------------------------------------------------


def random_flip(key: jax.Array, img: jax.Array, axes=(0,), p: float = 0.5):
    """torchio ``RandomFlip`` (default: flip axis 0 with p=0.5)."""
    keys = jax.random.split(key, len(axes))
    for ax, k in zip(axes, keys):
        do = jax.random.bernoulli(k, p)
        img = jnp.where(do, jnp.flip(img, axis=ax), img)
    return img


def _rotation_matrix(angles: jax.Array) -> jax.Array:
    """Composed Euler rotation R = Rx·Ry·Rz, angles in radians."""
    ax, ay, az = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rx @ ry @ rz


def _affine_exact(img: jax.Array, minv: jax.Array) -> jax.Array:
    """Single-pass trilinear warp via gather (``map_coordinates``).  Exact
    torchio/ITK linear-resampler semantics, but gather-bound — slow on TPU.
    Kept as the golden path for parity tests (``PCRL_AFFINE=exact``)."""
    shape = img.shape
    center = (jnp.asarray(shape, jnp.float32) - 1.0) / 2.0
    grid = jnp.stack(
        jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in shape],
                     indexing="ij"),
        axis=0,
    ).reshape(3, -1)
    src = minv @ (grid - center[:, None]) + center[:, None]
    # minimum-value padding with a static cval: shift so OOB fill (0) lands
    # at the volume minimum, then shift back.
    mn = jnp.min(img).astype(jnp.float32)
    out = map_coordinates(img.astype(jnp.float32) - mn, list(src), order=1,
                          mode="constant", cval=0.0)
    return (out + mn).reshape(shape).astype(img.dtype)


def _elem_pass(v: jax.Array, k: int, j: int, s, lam, tau) -> jax.Array:
    """One elementary resampling pass: coordinate ``k`` is re-read at
    ``src = s·x_k + λ·x_j + τ`` with linear interpolation, other axes fixed.

    TPU-first formulation: instead of a gather, build the banded interp
    matrix ``W[x_j, i, n] = hat(s·i + λ·x_j + τ − n)`` and contract it on the
    MXU — a batched (N_out × N_in) matmul per x_j line.  Out-of-range rows get
    all-zero weights, which reproduces constant-0 padding.
    """
    n = v.shape[k]
    nj = v.shape[j]
    i = jnp.arange(n, dtype=jnp.float32)
    jc = jnp.arange(nj, dtype=jnp.float32)
    src = s * i[None, :] + lam * jc[:, None] + tau          # (J, N_out)
    w = jnp.maximum(
        0.0, 1.0 - jnp.abs(src[:, :, None] - i[None, None, :]))  # (J, No, Ni)
    eq = {
        (0, 1): "yin,nyz->iyz",
        (0, 2): "zin,nyz->iyz",
        (1, 0): "xin,xnz->xiz",
        (1, 2): "zin,xnz->xiz",
        (2, 0): "xin,xyn->xyi",
        (2, 1): "yin,xyn->xyi",
    }[(k, j)]
    return jnp.einsum(eq, w, v)


def _affine_shear(img: jax.Array, minv: jax.Array) -> jax.Array:
    """Affine warp as 7 elementary MXU passes (no gathers).

    The homogeneous map ``p ↦ Minv·(p−c)+c`` is LU-factored into elementary
    row operations — each "resample one axis at s·x_k + λ·x_j + τ" — and the
    passes are applied in the order whose matrix product reconstructs the full
    transform (L's three unit shears, then the U rows bottom-up with the
    translation folded in).  Each pass is a banded-matrix einsum, so the whole
    warp runs on the MXU at memory bandwidth instead of the VPU's gather path
    (~100× faster at (64,64,32)).

    Numerics: 7 chained linear interpolations smooth slightly more than one
    trilinear gather; agreement with ``_affine_exact`` is tested to a
    documented tolerance on smooth volumes (``tests/test_augment3d.py``).
    """
    shape = jnp.asarray(img.shape, jnp.float32)
    c = (shape - 1.0) / 2.0

    # LU of Minv (no pivoting: the sampled affines are diagonally dominant)
    m = minv
    l10 = m[1, 0] / m[0, 0]
    l20 = m[2, 0] / m[0, 0]
    u11 = m[1, 1] - l10 * m[0, 1]
    u12 = m[1, 2] - l10 * m[0, 2]
    l21 = (m[2, 1] - l20 * m[0, 1]) / u11
    u22 = m[2, 2] - l20 * m[0, 2] - l21 * u12
    u00, u01, u02 = m[0, 0], m[0, 1], m[0, 2]

    mn = jnp.min(img).astype(jnp.float32)
    v = img.astype(jnp.float32) - mn
    one = jnp.float32(1.0)

    def cpass(vol, k, j, s, lam):
        # Every pass fixes the volume center: τ = c_k(1−s) − λ·c_j.  The
        # linear parts compose to Minv and H = "Minv about the center" is the
        # unique affine with that linear part fixing c, so the product is
        # exactly the target map — while intermediate shears never translate
        # content near the center out of bounds (uncentered LU shears lose
        # edge content between passes).
        tau = c[k] * (1.0 - s) - lam * c[j]
        return _elem_pass(vol, k, j, s, lam, tau)

    # applied order: L shears, then U rows bottom-up (see docstring)
    v = cpass(v, 1, 0, one, l10)        # x1 += l10·(x0−c0)
    v = cpass(v, 2, 0, one, l20)        # x2 += l20·(x0−c0)
    v = cpass(v, 2, 1, one, l21)        # x2 += l21·(x1−c1)
    v = cpass(v, 2, 0, u22, jnp.float32(0.0))   # x2 scale about center
    v = cpass(v, 1, 2, u11, u12)        # x1 = u11·x1 + u12·x2 (centered)
    v = cpass(v, 0, 1, u00, u01)        # x0 = u00·x0 + u01·x1 (centered)
    v = cpass(v, 0, 2, one, u02 / u00)  # x0 += (u02/u00)·(x2−c2)
    return (v + mn).astype(img.dtype)


def affine_impl() -> str:
    """``"shear"`` (default, MXU passes) or ``"exact"`` (gather; golden path).
    Select with ``PCRL_AFFINE=exact``."""
    import os

    return os.environ.get("PCRL_AFFINE", "shear").lower()


def random_affine(
    key: jax.Array,
    img: jax.Array,
    degrees: float = 10.0,
    scales: Tuple[float, float] = (0.9, 1.1),
    impl: str | None = None,
):
    """torchio ``RandomAffine`` equivalent: per-axis scale + Euler rotation
    about the volume center, trilinear resampling, minimum-value padding.

    Two resampling backends share the same sampled parameters:
    ``shear`` (MXU banded matmuls, default) and ``exact`` (trilinear gather,
    the torchio-parity golden path).
    """
    kr, ks = jax.random.split(key)
    angles = jax.random.uniform(kr, (3,), minval=-degrees, maxval=degrees)
    angles = angles * (jnp.pi / 180.0)
    scale = jax.random.uniform(ks, (3,), minval=scales[0], maxval=scales[1])

    # output coord -> input coord: inverse of (R @ diag(scale))
    m = _rotation_matrix(angles) * scale[None, :]
    minv = jnp.linalg.inv(m)
    if (impl or affine_impl()) == "exact":
        return _affine_exact(img, minv)
    return _affine_shear(img, minv)


def spatial_transform(key: jax.Array, img: jax.Array):
    """RandomFlip + RandomAffine (reference ``data.py:73-76``)."""
    k1, k2 = jax.random.split(key)
    img = random_flip(k1, img)
    return random_affine(k2, img)


# ---------------------------------------------------------------------------
# intensity
# ---------------------------------------------------------------------------

# shared separable-blur primitives (also used by the 2D stack)
from pcrlv2_tpu.ops.blur import blur_axis as _blur_axis  # noqa: E402
from pcrlv2_tpu.ops.blur import gaussian_kernel as _gaussian_kernel  # noqa: E402


def random_blur(key: jax.Array, img: jax.Array, std=(0.0, 2.0)):
    """torchio ``RandomBlur``: per-axis σ ~ U(std)."""
    sigmas = jax.random.uniform(key, (3,), minval=std[0], maxval=std[1])
    out = img.astype(jnp.float32)
    for ax in range(3):
        out = _blur_axis(out, _gaussian_kernel(sigmas[ax]), ax)
    return out


def random_noise(key: jax.Array, img: jax.Array, std=(0.0, 0.25)):
    """torchio ``RandomNoise``: x + N(0, σ²), σ ~ U(std)."""
    ks, kn = jax.random.split(key)
    sigma = jax.random.uniform(ks, (), minval=std[0], maxval=std[1])
    return img + sigma * jax.random.normal(kn, img.shape, jnp.float32)


def random_gamma(key: jax.Array, img: jax.Array, log_gamma=(-0.3, 0.3)):
    """torchio ``RandomGamma``: γ = exp(U(log_gamma)), sign-preserving power."""
    g = jnp.exp(jax.random.uniform(key, (), minval=log_gamma[0],
                                   maxval=log_gamma[1]))
    return jnp.sign(img) * jnp.power(jnp.abs(img), g)


def random_swap(key: jax.Array, img: jax.Array,
                patch_size=(8, 4, 4), num_iterations: int = 100):
    """torchio ``RandomSwap``: swap pairs of random patches (context
    disruption; reference ``data.py:86``).

    TPU-first formulation: patches are snapped to the non-overlapping
    (px, py, pz) grid, the ``num_iterations`` random transpositions are
    composed into one index permutation with a cheap scalar ``fori_loop``
    on a (G,) int32 array, and the volume is shuffled with a single patch
    gather — instead of 100 sequential dynamic-slice swap round-trips.

    Deviation from torchio (documented): torchio draws patch corners at
    arbitrary voxel offsets; grid snapping gives the same corruption
    statistics (same patch count/size/pair distance distribution) with a
    permutation that composes in registers.
    """
    px, py, pz = patch_size
    sx, sy, sz = img.shape
    gx, gy, gz = sx // px, sy // py, sz // pz
    n = gx * gy * gz

    def body(i, carry):
        perm, key = carry
        key, k = jax.random.split(key)
        ab = jax.random.randint(k, (2,), 0, n)
        # compose transposition (a b); a == b is the identity draw torchio's
        # disjointness resampling would reject — harmless here.
        pa, pb = perm[ab[0]], perm[ab[1]]
        perm = perm.at[ab[0]].set(pb).at[ab[1]].set(pa)
        return perm, key

    perm, _ = lax.fori_loop(
        0, num_iterations, body, (jnp.arange(n, dtype=jnp.int32), key))
    # (gx, px, gy, py, gz, pz) -> (G, px·py·pz), permute patches, restore.
    # The row permutation is applied as a one-hot matmul on the MXU — the
    # row gather was the aug program's last gather (same trick as the
    # banded blur; numerics exact, permutation matrices are 0/1).
    patches = img[: gx * px, : gy * py, : gz * pz].reshape(
        gx, px, gy, py, gz, pz).transpose(0, 2, 4, 1, 3, 5).reshape(n, -1)
    onehot = (perm[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
              ).astype(patches.dtype)
    shuffled = jnp.dot(onehot, patches, preferred_element_type=jnp.float32
                       ).astype(patches.dtype)
    out = shuffled.reshape(gx, gy, gz, px, py, pz).transpose(
        0, 3, 1, 4, 2, 5).reshape(gx * px, gy * py, gz * pz)
    # volumes are exact multiples of the patch grid in this workload; keep a
    # general path for remainders anyway
    if (gx * px, gy * py, gz * pz) != (sx, sy, sz):
        out = lax.dynamic_update_slice(img, out, (0, 0, 0))
    return out


def z_normalize(img: jax.Array, eps: float = 1e-8):
    """torchio ``ZNormalization``: (x − μ)/σ over the volume, unbiased σ."""
    x = img.astype(jnp.float32)
    mean = jnp.mean(x)
    n = x.size
    var = jnp.sum((x - mean) ** 2) / jnp.maximum(n - 1, 1)
    return (x - mean) / jnp.maximum(jnp.sqrt(var), eps)


def global_intensity_transform(key: jax.Array, img: jax.Array):
    """Blur → Noise → Gamma → Swap → ZNorm (reference ``data.py:83-89``)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = random_blur(k1, img)
    img = random_noise(k2, img)
    img = random_gamma(k3, img)
    img = random_swap(k4, img)
    return z_normalize(img)


def local_intensity_transform(key: jax.Array, img: jax.Array):
    """Blur → Noise → Gamma → ZNorm (reference ``data.py:77-82``)."""
    k1, k2, k3 = jax.random.split(key, 3)
    img = random_blur(k1, img)
    img = random_noise(k2, img)
    img = random_gamma(k3, img)
    return z_normalize(img)


# ---------------------------------------------------------------------------
# dormant Model-Genesis ops — part of the capability surface
# (reference lunaDataset.py:128-220, commented out of __getitem__ upstream)
# ---------------------------------------------------------------------------


def bezier_intensity_map(key: jax.Array, img: jax.Array, n_points: int = 100000):
    """Bézier nonlinear intensity remap (reference ``lunaDataset.py:128-141``).

    Control points (0,0), (r1), (r2), (1,1); with p=0.5 the x-values are
    sorted only (non-monotone curve) else both sorted.  Uses closed-form
    Bernstein coefficients (no scipy ``comb``).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    rnd = jax.random.uniform(k1, (4,))
    xs = jnp.array([0.0, rnd[0], rnd[2], 1.0])
    ys = jnp.array([0.0, rnd[1], rnd[3], 1.0])
    t = jnp.linspace(0.0, 1.0, n_points)
    # cubic Bernstein basis, reference ordering (t^(n-i)·(1-t)^i)
    basis = jnp.stack([
        t ** 3, 3.0 * t ** 2 * (1 - t), 3.0 * t * (1 - t) ** 2, (1 - t) ** 3
    ])
    xv = xs @ basis
    yv = ys @ basis
    flip_only_x = jax.random.bernoulli(k2, 0.5)
    xv = jnp.sort(xv)
    yv = jnp.where(flip_only_x, yv, jnp.sort(yv))
    out = jnp.interp(img, xv, yv)
    apply = jax.random.bernoulli(k3, 0.5)
    return jnp.where(apply, out, img)


def local_pixel_shuffling(key: jax.Array, img: jax.Array, num_block: int = 64,
                          max_block_frac: int = 10):
    """Model-Genesis local pixel shuffling (reference ``lunaDataset.py:143-170``).

    Shuffles voxels inside ``num_block`` random sub-blocks.  jit-compatible
    reformulation: fixed max block size s//max_block_frac per axis, shuffling
    implemented as a random permutation *within* the dynamic sub-block using a
    random-key sort, masked to the live extent.
    """
    sx, sy, sz = img.shape
    bx, by, bz = max(sx // max_block_frac, 1), max(sy // max_block_frac, 1), \
        max(sz // max_block_frac, 1)

    def body(i, carry):
        img, key = carry
        key, kc, kp = jax.random.split(key, 3)
        c = jax.random.randint(kc, (3,), jnp.array([0, 0, 0]),
                               jnp.array([sx - bx + 1, sy - by + 1, sz - bz + 1]))
        block = lax.dynamic_slice(img, (c[0], c[1], c[2]), (bx, by, bz))
        flat = block.reshape(-1)
        perm = jax.random.permutation(kp, flat.shape[0])
        img = lax.dynamic_update_slice(
            img, flat[perm].reshape(bx, by, bz), (c[0], c[1], c[2]))
        return img, key

    img, _ = lax.fori_loop(0, num_block, body, (img, key))
    return img


def _random_box(key, shape, lo_frac, hi_frac, margin=3):
    """Sample a random box: corner + per-axis size in [⌊s·lo⌋, ⌊s·hi⌋]."""
    ks, kc = jax.random.split(key)
    shape_arr = jnp.asarray(shape)
    lo = (shape_arr * jnp.asarray(lo_frac)).astype(jnp.int32)
    hi = (shape_arr * jnp.asarray(hi_frac)).astype(jnp.int32)
    size = jax.random.randint(ks, (3,), jnp.minimum(lo, hi),
                              jnp.maximum(lo, hi) + 1)
    corner = jax.random.randint(
        kc, (3,), margin, jnp.maximum(shape_arr - size - margin, margin + 1))
    masks = []
    for ax in range(3):
        idx = jnp.arange(shape[ax])
        masks.append((idx >= corner[ax]) & (idx < corner[ax] + size[ax]))
    return (masks[0][:, None, None] & masks[1][None, :, None]
            & masks[2][None, None, :])


def image_in_painting(key: jax.Array, img: jax.Array, cnt: int = 5):
    """Model-Genesis in-painting (reference ``lunaDataset.py:172-188``):
    overwrite up to ``cnt`` random boxes (size s/6…s/3) with uniform noise."""
    def body(i, carry):
        img, key = carry
        key, kb, kn, kp = jax.random.split(key, 4)
        box = _random_box(kb, img.shape, 1 / 6, 1 / 3)
        noise = jax.random.uniform(kn, img.shape)
        keep = jax.random.bernoulli(kp, 0.05)  # reference: while random()<0.95
        img = jnp.where(box & ~keep, noise, img)
        return img, key

    img, _ = lax.fori_loop(0, cnt, body, (img, key))
    return img


def image_out_painting(key: jax.Array, img: jax.Array, cnt: int = 4):
    """Model-Genesis out-painting (reference ``lunaDataset.py:190-220``):
    replace everything *outside* random kept boxes with noise.  Kept-box
    sizes are ``s − randint(3s/7, 4s/7)`` ∈ [3s/7, 4s/7] per axis."""
    key, kn, k0 = jax.random.split(key, 3)
    keep = _random_box(k0, img.shape, 3 / 7, 4 / 7, margin=3)

    def body(i, carry):
        keep, key = carry
        key, kb, kp = jax.random.split(key, 3)
        box = _random_box(kb, img.shape, 3 / 7, 4 / 7)
        skip = jax.random.bernoulli(kp, 0.05)
        keep = jnp.where(skip, keep, keep | box)
        return keep, key

    keep, _ = lax.fori_loop(0, cnt, body, (keep, key))
    noise = jax.random.uniform(kn, img.shape)
    return jnp.where(keep, img, noise)


# ---------------------------------------------------------------------------
# batch-level aug fn for the fused train step
# ---------------------------------------------------------------------------


def _augment_one_3d(key, crop1, crop2, local_crops,
                    use_painting: bool, paint_rate: float,
                    use_pixel_shuffle: bool, inpaint_rate: float = 0.2):
    """Per-sample pipeline of reference ``lunaDataset.py:28-81``."""
    keys = jax.random.split(key, 8)
    gt1 = spatial_transform(keys[0], crop1)
    gt2 = spatial_transform(keys[1], crop2)
    x1 = global_intensity_transform(keys[2], gt1)
    x2 = global_intensity_transform(keys[3], gt2)

    if use_pixel_shuffle:  # dormant upstream (lunaDataset.py:43-44)
        kp1, kp2 = jax.random.split(keys[6])
        x1 = local_pixel_shuffling(kp1, x1)
        x2 = local_pixel_shuffling(kp2, x2)
    if use_painting:  # dormant upstream (lunaDataset.py:45-55)
        # with prob paint_rate: in-paint both views with prob inpaint_rate,
        # otherwise out-paint both (Model-Genesis inpaint_rate default 0.2)
        kp, ki, ka, kb, kc, kd = jax.random.split(keys[7], 6)
        do = jax.random.bernoulli(kp, paint_rate)
        inp = jax.random.bernoulli(ki, inpaint_rate)
        painted1 = jnp.where(inp, image_in_painting(ka, x1),
                             image_out_painting(kc, x1))
        painted2 = jnp.where(inp, image_in_painting(kb, x2),
                             image_out_painting(kd, x2))
        x1 = jnp.where(do, painted1, x1)
        x2 = jnp.where(do, painted2, x2)

    n_local = local_crops.shape[0]
    lkeys = jax.random.split(keys[4], n_local)

    def aug_local(k, img):
        ks, ki = jax.random.split(k)
        img = spatial_transform(ks, img)
        return local_intensity_transform(ki, img)

    locals_out = jax.vmap(aug_local)(lkeys, local_crops)
    return x1, x2, gt1, gt2, locals_out


def make_luna_aug_fn(use_painting: bool = False, paint_rate: float = 0.5,
                     use_pixel_shuffle: bool = False,
                     inpaint_rate: float = 0.2):
    """Build the batch aug fn for the 3D pipeline.

    Input batch: ``{'pair': (B, 2, X, Y, Z), 'locals': (B, V, x, y, z)}`` —
    raw preprocessed crops as stored on disk (``{uid}_global_k.npy`` /
    ``_local_k.npy``, reference ``luna_preprocess.py:144-145``).
    Output views: ``x1, x2, gt, gt2`` (B, X, Y, Z, 1) and ``locals``
    (B, V, x, y, z, 1), matching ``Pcrlv2LunaPretask.__getitem__``
    (reference ``lunaDataset.py:28-81``; ``gt2`` is produced-but-unused there
    too, kept for API parity).
    """

    def aug_fn(key, batch):
        pair = batch["pair"].astype(jnp.float32)
        local_crops = batch["locals"].astype(jnp.float32)
        b = pair.shape[0]
        keys = jax.random.split(key, b)
        fn = partial(_augment_one_3d, use_painting=use_painting,
                     paint_rate=paint_rate,
                     use_pixel_shuffle=use_pixel_shuffle,
                     inpaint_rate=inpaint_rate)
        x1, x2, gt1, gt2, locals_out = jax.vmap(fn)(
            keys, pair[:, 0], pair[:, 1], local_crops)
        return {
            "x1": x1[..., None],
            "x2": x2[..., None],
            "gt": gt1[..., None],
            "gt2": gt2[..., None],
            "locals": locals_out[..., None],
        }

    return aug_fn
