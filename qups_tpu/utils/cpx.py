"""Complex <-> real-pair interop for the TPU boundary.

The TPU backend in this environment (and TPU hardware generally) has no
native complex dtype: XLA decomposes complex math inside a compiled program,
but complex arrays at program *boundaries* (uploads of device-resident
results, downloads) are unsupported/unimplemented. The reference CUDA code
faces the same reality and uses ``float2`` pairs everywhere
(``/root/reference/src/bf.cu``, ``helper_math.h``).

Contract used throughout qups_tpu:

* **Inside** ``jit`` — use complex64 freely; XLA lowers it.
* **At jit boundaries / host transfers** — represent complex data as a real
  array with a trailing length-2 axis (``(..., 2)``, "ri format").

Helpers here convert between the two on either side of the boundary.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ri_split(x):
    """Complex array -> real ``(..., 2)`` pair (works on host or device)."""
    xp = np if isinstance(x, np.ndarray) else jnp
    return xp.stack([xp.real(x), xp.imag(x)], axis=-1)


def ri_join(x):
    """Real ``(..., 2)`` pair -> complex array."""
    if isinstance(x, np.ndarray):
        return x[..., 0] + 1j * x[..., 1]
    return jnp.asarray(x)[..., 0] + 1j * jnp.asarray(x)[..., 1]


def to_host(x) -> np.ndarray:
    """Device -> numpy, routing complex arrays through the ri format.

    Safe on backends where downloading complex buffers is unimplemented.
    """
    if isinstance(x, np.ndarray):
        return x
    if jnp.iscomplexobj(x):
        import jax

        ri = jax.jit(ri_split)(x)
        return ri_join(np.asarray(ri))
    return np.asarray(x)


def to_device_ri(x) -> jnp.ndarray:
    """Host (possibly complex) array -> real ri-format device array."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return jnp.asarray(ri_split(x))
    return jnp.asarray(ri_split(x.astype(np.complex64)))


def czeros(shape):
    """Eager-safe complex zeros.

    ``jnp.zeros(shape, complex64)`` run eagerly uploads a python complex
    scalar — a host->device complex transfer, unsupported on this backend.
    Building the array from real zeros keeps every transfer real.
    """
    z = jnp.zeros(shape, jnp.float32)
    import jax

    return jax.lax.complex(z, z)


def cexp(theta):
    """Eager-safe ``exp(1j * theta)`` for real ``theta``.

    ``jnp.exp(1j * theta)`` run eagerly multiplies by the host complex
    scalar ``1j`` (an unsupported upload); cos/sin + lax.complex keeps all
    transfers real. Inside jit both forms are equivalent.
    """
    import jax

    return jax.lax.complex(jnp.cos(theta), jnp.sin(theta))


# module-level jit: a fresh ``jax.jit(lambda ...)`` per call would miss the
# jit cache and recompile every call — a multi-second cost on this
# backend's remote-build toolchain (jit itself is lazy; defining it at
# import costs nothing)
_JOIN = jax.jit(lambda a, b: a + 1j * b)


def cjoin(re, im):
    """Combine device-resident real/imag parts into complex (cached jit)."""
    return _JOIN(re, im)


def to_device(x):
    """Host array -> device array, routing complex uploads through the ri
    format.

    On this backend a *device-resident* complex array is legal (jits may
    return and consume them); only the host<->device transfer of a complex
    buffer is unimplemented. So: upload the ri pair, recombine in a jit.
    Device arrays pass through untouched.
    """
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        import jax

        return jax.jit(ri_join)(jnp.asarray(ri_split(x)))
    return jnp.asarray(x)
