"""In-program probes for the lane-starved edge ops of PCRLv23d:

* input conv 1->32  (Ci=1: XLA runs at ~Ci/128 of the matmul rate)
* mask head 64->1   (Co=1: same story on the output side)
* convT k2s2 at the big decoder shapes (current einsum form measures ~11 TF)

Each candidate is chained K times inside one jit (data-dependent, CSE-proof)
and differenced K=2 vs K=8 to exclude the ~4-5 ms tunnel dispatch overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/proto_edge_convs.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

B = 32
DT = jnp.bfloat16
K0, K1 = 2, 8


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n


def per_iter(make_one, x, w, grad=False):
    """Per-iteration time of `make_one(x, w)` chained K times in-program."""

    def chain(k):
        def f(x, w):
            y = x
            for i in range(k):
                out = make_one(y, w)
                # feed a same-shaped perturbation of x forward: mix the
                # output back in at one voxel so the chain is data-dependent
                y = x * (1.0 + 0.0001 * i) + jnp.mean(
                    out.astype(jnp.float32)).astype(x.dtype) * 1e-6
            return out

        if grad:
            def g(x, w):
                return f(x, w).astype(jnp.float32).sum()

            return jax.jit(jax.grad(g, argnums=(0, 1)))
        return jax.jit(f)

    t0 = timeit(chain(K0), x, w)
    t1 = timeit(chain(K1), x, w)
    return (t1 - t0) / (K1 - K0)


def dn(x):  # NDHWC conv dims
    return ("NDHWC", "DHWIO", "NDHWC")


# --- input conv 1->32 -----------------------------------------------------


def inconv_xla(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=dn(x))


def inconv_im2col(x, w):
    """Ci=1: materialize all 27 tap shifts as channels, one matmul."""
    b, d, h, wd, _ = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1), (1, 1)))
    cols = jnp.stack(
        [xp[:, td:td + d, th:th + h, tw:tw + wd]
         for td in range(3) for th in range(3) for tw in range(3)], axis=-1)
    return jnp.einsum("bdhwk,ko->bdhwo", cols, w.reshape(27, co),
                      preferred_element_type=DT)


def inconv_banded(x, w):
    """Ci=1: tw taps as a banded (W, W*Co) matmul built in-graph; td,th as 9
    pad-shifts."""
    b, d, h, wd, _ = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for td in range(3):
        for th in range(3):
            wtap = w[td, th, :, 0, :].astype(DT)           # (3, co)
            s = jnp.asarray(_band_onehot(wd), DT)          # (3, wi, wo)
            band = jnp.einsum("tiv,tc->ivc", s, wtap)      # (wi, wo, co)
            bmat = band.reshape(wd, wd * co)
            xs = xp[:, td:td + d, th:th + h, :]
            y = (xs.reshape(-1, wd) @ bmat).reshape(b, d, h, wd, co)
            out = y if out is None else out + y
    return out


# --- mask head 64->1 ------------------------------------------------------


def mask_xla(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=dn(x))


def _band_onehot(wd):
    """Static (3, W_in, W_out) one-hot: S[tw, wi, wo] = 1 iff wi == wo+tw-1."""
    s = np.zeros((3, wd, wd), np.float32)
    for tw in range(3):
        for wo in range(wd):
            wi = wo + tw - 1
            if 0 <= wi < wd:
                s[tw, wi, wo] = 1.0
    return s


def mask_banded(x, w):
    """Co=1: tw+Ci as a banded (W*Ci, W) matmul built IN-GRAPH from w (the
    tap->position map is a static one-hot, so the band is differentiable);
    td,th as 9 pad-shifts."""
    b, d, h, wd, ci = x.shape
    s = jnp.asarray(_band_onehot(wd), DT)  # (3, wi, wo)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    out = None
    for td in range(3):
        for th in range(3):
            wtap = w[td, th, :, :, 0].astype(DT)          # (3, ci)
            band = jnp.einsum("tiv,tc->icv", s, wtap)     # (wi, ci, wo)
            bmat = band.reshape(wd * ci, wd)
            xs = xp[:, td:td + d, th:th + h, :, :]
            y = (xs.reshape(-1, wd * ci) @ bmat).reshape(b, d, h, wd, 1)
            out = y if out is None else out + y
    return out


def mask_banded9(x, w):
    """Co=1: ALL of tw+td+th+Ci in one banded (W*Ci*9, W) matmul — the 9
    (td,th) shifted views are lane-concatenated once, then a single matmul."""
    b, d, h, wd, ci = x.shape
    s = jnp.asarray(_band_onehot(wd), DT)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    views = [xp[:, td:td + d, th:th + h, :, :].reshape(b, d, h, wd * ci)
             for td in range(3) for th in range(3)]
    xcat = jnp.concatenate(views, axis=-1)                # (b,d,h, 9*W*ci)
    bands = []
    for td in range(3):
        for th in range(3):
            wtap = w[td, th, :, :, 0].astype(DT)
            bands.append(jnp.einsum("tiv,tc->icv", s, wtap).reshape(
                wd * ci, wd))
    bmat = jnp.concatenate(bands, axis=0)                 # (9*W*ci, W)
    y = xcat.reshape(-1, 9 * wd * ci) @ bmat
    return y.reshape(b, d, h, wd, 1)


def mask_psum(x, w):
    """Co=1 as 27 VPU multiply-accumulate passes (x * w_tap summed over Ci
    via one final lane reduction)."""
    b, d, h, wd, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, d, h, wd, ci), jnp.float32)
    for td in range(3):
        for th in range(3):
            for tw in range(3):
                acc = acc + (xp[:, td:td + d, th:th + h, tw:tw + wd, :]
                             * w[td, th, tw, :, 0]).astype(jnp.float32)
    return jnp.sum(acc, axis=-1, keepdims=True).astype(x.dtype)


# --- convT k2s2 -----------------------------------------------------------


def convt_einsum(x, w):
    """Current production form (ops/convolution.py): one einsum + interleave."""
    b, d, h, wd, ci = x.shape
    co = w.shape[-1]
    y = jnp.einsum("bdhwi,kmnio->bdhwkmno", x,
                   w, preferred_element_type=DT)
    y = y.reshape(b, d, h, wd, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(b, 2 * d, 2 * h, 2 * wd, co)


def convt_matmul8(x, w):
    """8 separate matmuls + one interleave transpose."""
    b, d, h, wd, ci = x.shape
    co = w.shape[-1]
    xm = x.reshape(-1, ci)
    wm = w.reshape(8, ci, co)
    ys = jnp.einsum("mi,kio->kmo", xm, wm, preferred_element_type=DT)
    y = ys.reshape(2, 2, 2, b, d, h, wd, co)
    y = y.transpose(3, 4, 0, 5, 1, 6, 2, 7)
    return y.reshape(b, 2 * d, 2 * h, 2 * wd, co)


def convt_xla(x, w):
    """lax dilated-conv form."""
    return lax.conv_general_dilated(
        x, jnp.flip(w, (0, 1, 2)).swapaxes(3, 4), (1, 1, 1),
        [(1, 1)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWOI", "NDHWC"))[:, 1:, 1:, 1:, :]


def run(title, shape, w_shape, impls, ref_name, grad_too=True):
    kx, kw = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (B,) + shape, DT)
    w = jax.random.normal(kw, w_shape, DT) * 0.1
    ref = None
    print(f"-- {title} {shape} w{w_shape}")
    for name, fn in impls:
        try:
            out = jax.jit(fn)(x, w)
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
            tf_ = per_iter(fn, x, w)
            tg = per_iter(fn, x, w, grad=True) if grad_too else float("nan")
            print(f"   {name:10s} fwd {tf_*1e3:7.2f} ms  fwd+bwd "
                  f"{tg*1e3:7.2f} ms  (err vs {ref_name} {err:.2e})")
        except Exception as e:
            print(f"   {name:10s} FAIL {type(e).__name__}: {str(e)[:90]}")


def main():
    print("devices:", jax.devices())
    run("input conv 1->32", (64, 64, 32, 1), (3, 3, 3, 1, 32),
        [("xla", inconv_xla), ("im2col27", inconv_im2col),
         ("banded", inconv_banded)], "xla")
    run("mask head 64->1", (64, 64, 32, 64), (3, 3, 3, 64, 1),
        [("xla", mask_xla), ("banded", mask_banded),
         ("banded9", mask_banded9)], "xla")
    run("mask head 128->1 @32^3", (32, 32, 16, 128), (3, 3, 3, 128, 1),
        [("xla", mask_xla), ("banded", mask_banded),
         ("banded9", mask_banded9)], "xla")


if __name__ == "__main__":
    main()
