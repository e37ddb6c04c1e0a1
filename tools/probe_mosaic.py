"""Empirical probes of Mosaic lowering support on this jax/libtpu version —
each probe compiles+runs a tiny kernel and reports OK / fail. Guides which
conv formulations are expressible.
"""

import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        np.asarray(out)
        print(f"OK    {name}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL  {name}: {msg}")
        return False


def run(kernel, out_shape, *xs, scratch=()):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(*out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in xs],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
    )(*xs)


def main():
    print("devices:", jax.devices())
    x = jnp.arange(64 * 32, dtype=jnp.float32).reshape(64, 32)
    big = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    x3 = jnp.arange(8 * 64 * 32, dtype=jnp.float32).reshape(8, 64, 32)

    # 1. lane-dim concat of two 32-lane values
    probe("concat lanes 32+32", lambda: run(
        lambda a, b, o: o.__setitem__(slice(None),
                                      jnp.concatenate([a[:], b[:]], axis=-1)),
        ((64, 64), jnp.float32), x, x))

    # 2. lane-dim concat 64+64
    x64 = jnp.arange(64 * 64, dtype=jnp.float32).reshape(64, 64)
    probe("concat lanes 64+64", lambda: run(
        lambda a, b, o: o.__setitem__(slice(None),
                                      jnp.concatenate([a[:], b[:]], axis=-1)),
        ((64, 128), jnp.float32), x64, x64))

    # 3. lane slice at offset 32 from 128 lanes
    probe("lane slice [32:64] of 128", lambda: run(
        lambda a, o: o.__setitem__(slice(None), a[:, 32:64]),
        ((64, 32), jnp.float32), big))

    # 4. lane slice at offset 64
    probe("lane slice [64:128] of 128", lambda: run(
        lambda a, o: o.__setitem__(slice(None), a[:, 64:128]),
        ((64, 64), jnp.float32), big))

    # 5. store to lane offset: scratch[:, 32:64] = v
    def store_off(a, o, s):
        s[:, 0:32] = a[:]
        s[:, 32:64] = a[:]
        o[:] = s[:]
    probe("lane-offset store [32:64]", lambda: run(
        store_off, ((64, 64), jnp.float32), x,
        scratch=(pltpu.VMEM((64, 64), jnp.float32),)))

    # 6. reshape (64, 9, 32) -> (64, 288)
    x9 = jnp.arange(64 * 9 * 32, dtype=jnp.float32).reshape(64, 9, 32)
    probe("reshape (64,9,32)->(64,288)", lambda: run(
        lambda a, o: o.__setitem__(slice(None), a[:].reshape(64, 288)),
        ((64, 288), jnp.float32), x9))

    # 7. reshape (8,64,32)->(512,32)  (merge leading into sublanes)
    probe("reshape (8,64,32)->(512,32)", lambda: run(
        lambda a, o: o.__setitem__(slice(None), a[:].reshape(512, 32)),
        ((512, 32), jnp.float32), x3))

    # 8. sublane-dim concat (64,32)+(64,32) -> (128,32)
    probe("concat sublanes", lambda: run(
        lambda a, b, o: o.__setitem__(slice(None),
                                      jnp.concatenate([a[:], b[:]], axis=0)),
        ((128, 32), jnp.float32), x, x))

    # 9. jnp.roll on lanes
    probe("roll lanes by 32", lambda: run(
        lambda a, o: o.__setitem__(slice(None), jnp.roll(a[:], 32, axis=-1)),
        ((64, 128), jnp.float32), big))

    # 10. pltpu.roll on lanes
    probe("pltpu.roll lanes by 32", lambda: run(
        lambda a, o: o.__setitem__(slice(None), pltpu.roll(a[:], 32, 1)),
        ((64, 128), jnp.float32), big))

    # 11. dot_general with 2 contraction dims (9,32)
    w9 = jnp.ones((9, 32, 16), jnp.float32)
    probe("dot 2 contraction dims", lambda: run(
        lambda a, w, o: o.__setitem__(
            slice(None),
            jax.lax.dot_general(a[:], w[:],
                                (((1, 2), (0, 1)), ((), ())),
                                preferred_element_type=jnp.float32)),
        ((64, 16), jnp.float32), x9, w9))

    # 12. transpose (64,32)->(32,64)
    probe("transpose 2d", lambda: run(
        lambda a, o: o.__setitem__(slice(None), a[:].T),
        ((32, 64), jnp.float32), x))

    # 13. strided lane slice a[:, 0:128:4]
    probe("strided lane slice", lambda: run(
        lambda a, o: o.__setitem__(slice(None), a[:, 0:128:4]),
        ((64, 32), jnp.float32), big))

    # 14. bf16 concat lanes 32+32
    xb = x.astype(jnp.bfloat16)
    probe("bf16 concat lanes 32+32", lambda: run(
        lambda a, b, o: o.__setitem__(slice(None),
                                      jnp.concatenate([a[:], b[:]], axis=-1)),
        ((64, 64), jnp.bfloat16), xb, xb))


if __name__ == "__main__":
    main()
