"""TPU A/B: packed train-chain kernels vs the XLA composition at the
128x128 bs32 recipe geometry (stem 14->64 + 4 bottlenecks 64/256)."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from deep_video_interpolation_extrapolation_tpu.core.cache import enable_compilation_cache
from deep_video_interpolation_extrapolation_tpu.ops import pallas_trainchain as tc

enable_compilation_cache()
dt = jnp.bfloat16
B, H, W, CI = 32, 128, 128, 14


def lrelu(v):
    return jnp.where(v >= 0, v, jnp.asarray(0.2, v.dtype) * v)


def ref_chain(x, stem_params, block_params):
    k1s, b1s, k2s, b2s = stem_params

    def conv(x, k):
        # f32 conv on upcast inputs == bf16 conv with f32 accumulation
        # (keeps the VJP dtype-clean; see ops/pallas_chain._block_ref)
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), k.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(dt)

    x = lrelu(conv(x, k1s) + b1s.astype(dt))
    x = lrelu(conv(x, k2s) + b2s.astype(dt))
    for (k1, k2, k3, kres) in block_params:
        h1 = lrelu(conv(x, k1))
        h2 = lrelu(conv(h1, k2))
        out = conv(h2, k3)
        res = conv(x, kres) if kres is not None else x
        x = lrelu(out + res)
    return x


def make_params(key, ci=14, planes=64, blocks=4):
    ks = jax.random.split(key, 32)
    it = iter(range(32))
    def w(shape, scale=0.1):
        return scale * jax.random.normal(ks[next(it)], shape, jnp.float32)
    stem = (w((3, 3, ci, planes)), w((planes,)),
            w((3, 3, planes, planes)), w((planes,)))
    bp = []
    cin = planes
    out_ch = 4 * planes
    for b in range(blocks):
        bp.append((w((1, 1, cin, planes)), w((3, 3, planes, planes)),
                   w((1, 1, planes, out_ch)),
                   w((1, 1, cin, out_ch)) if cin != out_ch else None))
        cin = out_ch
    return stem, bp


stem, bp = make_params(jax.random.PRNGKey(1))
x = (0.5 * jax.random.normal(jax.random.PRNGKey(0), (B, H, W, CI),
                             jnp.float32)).astype(dt)
ct = jax.random.normal(jax.random.PRNGKey(7), (B, H, W, 256),
                       jnp.float32).astype(dt)

# correctness vs XLA composition (bf16)
y_ref = jax.jit(lambda x: ref_chain(x, stem, bp))(x)
y_new = jax.jit(lambda x: tc.stem_layer1_chain(x, stem, bp))(x)
err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32) - y_new.astype(jnp.float32))))
scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32))))
print("fwd maxerr", err, "scale", scale, "rel", err / scale)


def g_ref(x, stem, bp, ct):
    return jnp.sum(ref_chain(x, stem, bp).astype(jnp.float32) * ct.astype(jnp.float32))


def g_new(x, stem, bp, ct):
    return jnp.sum(tc.stem_layer1_chain(x, stem, bp).astype(jnp.float32) * ct.astype(jnp.float32))


gr = jax.jit(jax.grad(g_ref, argnums=(0, 1, 2)))(x, stem, bp, ct)
gn = jax.jit(jax.grad(g_new, argnums=(0, 1, 2)))(x, stem, bp, ct)
# f32 oracle for accuracy comparison
def g_ref32(x, stem, bp, ct2):
    x = x.astype(jnp.float32)
    global dt
    old = dt
    y = None
    try:
        import builtins
        pass
    finally:
        pass
    # recompute in f32 by re-tracing with dt f32
    k1s, b1s, k2s, b2s = stem
    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
    def lr(v):
        return jnp.where(v >= 0, v, 0.2 * v)
    h = lr(conv(x, k1s) + b1s)
    h = lr(conv(h, k2s) + b2s)
    for (k1, k2, k3, kres) in bp:
        h1 = lr(conv(h, k1))
        h2 = lr(conv(h1, k2))
        out = conv(h2, k3)
        res = conv(h, kres) if kres is not None else h
        h = lr(out + res)
    return jnp.sum(h * ct2)


go = jax.jit(jax.grad(g_ref32, argnums=(0, 1, 2)))(x, stem, bp, ct.astype(jnp.float32))
for name, idx in [("dx", 0)]:
    a, b, o = gr[idx], gn[idx], go[idx]
    ra = float(jnp.max(jnp.abs(a.astype(jnp.float32) - o))) / (float(jnp.max(jnp.abs(o))) + 1e-9)
    rb = float(jnp.max(jnp.abs(b.astype(jnp.float32) - o))) / (float(jnp.max(jnp.abs(o))) + 1e-9)
    print(f"{name}: XLA-vs-oracle rel {ra:.2e}  chain-vs-oracle rel {rb:.2e}")
wa = [float(jnp.max(jnp.abs(p.astype(jnp.float32) - q))) / (float(jnp.max(jnp.abs(q))) + 1e-9)
      for p, q in zip(jax.tree_util.tree_leaves(gr[1:]), jax.tree_util.tree_leaves(go[1:]))]
wb = [float(jnp.max(jnp.abs(p.astype(jnp.float32) - q))) / (float(jnp.max(jnp.abs(q))) + 1e-9)
      for p, q in zip(jax.tree_util.tree_leaves(gn[1:]), jax.tree_util.tree_leaves(go[1:]))]
print(f"weight grads: XLA-vs-oracle worst rel {max(wa):.2e}  chain worst {max(wb):.2e}")

# ---- timing: scan-amortized fwd+bwd ----
def timed(fn, tag):
    @jax.jit
    def loop(x, ct):
        def body(c, _):
            dx = fn(c, ct)
            return (c + 0.0001 * dx).astype(dt), None
        out, _ = jax.lax.scan(body, x, None, length=20)
        return jnp.sum(out.astype(jnp.float32))
    float(loop(x, ct))  # compile+warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x, ct))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best / 20 * 1e3:.3f} ms/iter (fwd+bwd)")


timed(jax.grad(lambda x, ct: g_ref(x, stem, bp, ct)), "XLA composition")
timed(jax.grad(lambda x, ct: g_new(x, stem, bp, ct)), "pallas trainchain")
