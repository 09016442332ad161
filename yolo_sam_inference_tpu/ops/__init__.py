"""TPU compute ops: batched morphometrics, NMS, preprocessing, attention."""

from .metrics import calculate_metrics, batched_cell_metrics, METRIC_KEYS

__all__ = ["calculate_metrics", "batched_cell_metrics", "METRIC_KEYS"]


def mosaic_backend() -> bool:
    """True when the default backend can lower Mosaic (TPU) Pallas kernels.

    The real-chip backend in this environment reports platform "axon" (a
    tunneled TPU), so the check excludes the backends known NOT to lower
    Mosaic rather than matching "tpu" exactly. GPU backends would otherwise
    pick the fused kernel paths and fail at lowering."""
    import jax

    return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm", "METAL")
