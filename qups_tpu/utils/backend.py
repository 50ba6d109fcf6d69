"""Backend identification.

The Pallas kernels lower through Mosaic-TPU and only run compiled on a
TPU-class backend (including TPU-like remote platforms whose jax
platform name is not literally 'tpu'); GPU/CPU must take the XLA paths
or interpret mode. This is the ONE place that decides — the previous
per-site ``platform not in ("cpu",)`` idiom silently treated GPU as
TPU.
"""


def is_tpu_backend() -> bool:
    """True when the default JAX device can run compiled Mosaic/Pallas
    TPU kernels."""
    import jax

    return jax.devices()[0].platform.lower() not in (
        "cpu", "gpu", "cuda", "rocm", "metal")
