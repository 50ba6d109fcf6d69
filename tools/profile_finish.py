"""Micro-profile the greens finish candidates on the real grid shape."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

M, G, Npad, K, T = 128, 2504, 128, 41, 1462
rng = np.random.default_rng(0)
grid = jnp.asarray(rng.standard_normal((M, G, Npad)).astype(np.float32))
kv = jnp.asarray(np.hanning(K).astype(np.float32))
sh = rng.integers(0, 400, Npad)


def timeit(name, f):
    out = f()
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t1 = time.time()
        jax.block_until_ready(f())
        ts.append(time.time() - t1)
    print(json.dumps({"which": name, "s": round(min(ts), 4)}), flush=True)


from qups_tpu.ops.conv import convd

f1 = jax.jit(lambda g: convd(g, kv.reshape(1, -1, 1), axis=1, shape="full",
                             method="direct"))
timeit("convd-direct", lambda: f1(grid))

f2 = jax.jit(lambda g: convd(g, kv.reshape(1, -1, 1), axis=1, shape="full",
                             method="fft"))
timeit("convd-fft", lambda: f2(grid))


def slices(g):
    full = g
    cols = [full[:, int(s):int(s) + T, n] for n, s in enumerate(sh)]
    return jnp.stack(cols, axis=-1)


f3 = jax.jit(slices)
timeit("slice-stack", lambda: f3(grid))


def rfft_only(g):
    return jnp.fft.rfft(g, n=4096, axis=1)


f4 = jax.jit(rfft_only)
timeit("rfft-4096-axis1", lambda: f4(grid))


def gather_rows(g):
    # take_along_axis over axis 1 with per-lane shifts
    t = jnp.arange(T)[None, :, None]
    idx = jnp.asarray(sh)[None, None, :] + t  # (1, T, Npad)
    idx = jnp.broadcast_to(idx, (M, T, Npad))
    return jnp.take_along_axis(g, idx, axis=1)


f5 = jax.jit(gather_rows)
timeit("take-along-axis1", lambda: f5(grid))


def conv_lax(g):
    # conv via lax.conv_general_dilated: batch=M, spatial=G, feature=Npad
    return jax.lax.conv_general_dilated(
        g, jnp.tile(kv.reshape(K, 1, 1), (1, Npad, 1)) * 0 +
        kv.reshape(K, 1, 1) * jnp.eye(Npad)[None, :, :] * 0,  # placeholder
        (1,), [(K - 1, K - 1)])


def conv_depthwise(g):
    # depthwise conv: feature_group_count = Npad
    rhs = jnp.tile(kv.reshape(K, 1, 1), (1, 1, Npad))  # (K, 1, Npad)
    return jax.lax.conv_general_dilated(
        g, rhs, window_strides=(1,), padding=[(K - 1, K - 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=Npad)


f6 = jax.jit(conv_depthwise)
timeit("conv-depthwise", lambda: f6(grid))
