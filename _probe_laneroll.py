"""Mosaic probe: lane-axis rolls by non-128 amounts (scratch, not shipped).

Q: can the upshead taps finalize do `pltpu.roll(yt, 23*t, axis=-1)` on a
(rows, 207)-lane f32 array?  If yes, the 9-way shifted-add can fold into
the kernel via roll + first-23-lane masked accumulate (saving the 1.73 GB
yt round trip + the 5.9 ms retile copy).  Also probes a (rows, 256)
padded variant and bf16.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(shape, dt, shift, axis):
    def kern(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = pltpu.roll(v, shift, axis=axis if axis >= 0 else v.ndim + axis)

    x = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape)
    x = x.astype(dt)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, dt),
        )(x)
        ref = jnp.roll(x, shift, axis=axis)
        ok = bool(jnp.all(out == ref))
        print(f"ROLL shape={shape} dt={dt.__name__} shift={shift} "
              f"axis={axis}: compiled, correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"ROLL shape={shape} dt={dt.__name__} shift={shift} "
              f"axis={axis}: FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    for shape in [(64, 207), (64, 256), (8, 128, 207)]:
        for shift in (23, 46, 184):
            probe(shape, jnp.float32, shift, -1)
    probe((64, 256), jnp.bfloat16, 23, -1)
    # masked accumulate shape: where(lane < 23, rolled, 0) sum
    def kern2(x_ref, o_ref):
        v = x_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
        acc = jnp.zeros_like(v)
        for t in range(9):
            acc = acc + jnp.where(lane < 23, pltpu.roll(v, 23 * t, axis=v.ndim - 1),
                                  0.0)
        o_ref[...] = acc
    x = jnp.arange(64 * 207, dtype=jnp.float32).reshape(64, 207)
    try:
        out = pl.pallas_call(
            kern2, out_shape=jax.ShapeDtypeStruct((64, 207), jnp.float32))(x)
        ref = sum(jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (64, 207), 1) < 23,
            jnp.roll(x, 23 * t, axis=-1), 0.0) for t in range(9))
        print("ACC9: compiled, correct=", bool(jnp.all(out == ref)))
    except Exception as e:
        print("ACC9: FAILED", type(e).__name__, str(e).split(chr(10))[0][:160])


def probe_final_slice():
    """Store-adjacent sub-128 lane slice: o (rows, 23) = v[..., :23]."""
    def kern(x_ref, o_ref):
        v = x_ref[...].astype(jnp.float32)
        acc = v + pltpu.roll(v, 23, axis=v.ndim - 1)
        o_ref[...] = acc[..., :23].astype(x_ref.dtype)

    x = jnp.arange(64 * 207, dtype=jnp.float32).reshape(64, 207)
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((64, 23), jnp.float32))(x)
        ref = (x + jnp.roll(x, 23, axis=-1))[:, :23]
        print("FINAL_SLICE23: compiled, correct=", bool(jnp.all(out == ref)))
    except Exception as e:
        print("FINAL_SLICE23: FAILED", type(e).__name__,
              str(e).split(chr(10))[0][:160])


def probe_3d_roll_slice():
    """The real finalize shape: (th, 4wt, 207) rolls + final 23-lane store."""
    def kern(x_ref, o_ref):
        v = x_ref[...].astype(jnp.float32)
        acc = jnp.zeros_like(v)
        for t in range(9):
            acc = acc + pltpu.roll(v, (207 - 23 * t) % 207, axis=v.ndim - 1)
        o_ref[...] = acc[..., :23].astype(x_ref.dtype)

    x = jnp.arange(8 * 128 * 207, dtype=jnp.float32).reshape(8, 128, 207)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128, 23), jnp.float32))(x)
        ref = sum(jnp.roll(x, (207 - 23 * t) % 207, axis=-1)
                  for t in range(9))[..., :23]
        print("ROLL3D+SLICE: compiled, correct=", bool(jnp.all(out == ref)))
    except Exception as e:
        print("ROLL3D+SLICE: FAILED", type(e).__name__,
              str(e).split(chr(10))[0][:160])




if __name__ == "__main__":
    probe_final_slice()
    probe_3d_roll_slice()
