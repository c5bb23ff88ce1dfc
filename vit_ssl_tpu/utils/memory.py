"""Device-memory (HBM) introspection.

The reference has no memory observability at all (its closest analogue is
whatever `nvidia-smi` shows next to `/root/reference/utils/train_utils.py`'s
`setup_device`). On TPU the equivalent signal is the per-device allocator
statistics JAX exposes via ``Device.memory_stats()`` — peak/live bytes in
HBM. This module wraps that in a backend-tolerant helper: CPU devices (the
virtual test mesh) and tunnel transports that don't implement the stats API
simply report nothing instead of raising. (This environment's `axon`
remote-TPU transport is one such: ``memory_stats()`` returns None there, so
bench legs and trainer logs omit the HBM figures; on directly-attached TPU
runtimes the numbers appear.)

Used by ``bench.py`` (per-leg ``peak_hbm_gb`` so the ViT-L remat/accum
claims carry their memory footprint) and by the trainers (one INFO line
after the first optimizer step, when the compiled step + params + optimizer
state have all landed in HBM).
"""

from __future__ import annotations

from typing import Dict, Optional


def device_memory_stats(device=None) -> Optional[Dict[str, float]]:
    """Return ``{bytes_in_use, peak_bytes_in_use, bytes_limit}`` (floats,
    keys present only if the backend reports them) or None when the device
    exposes no allocator stats (CPU backend, some remote transports)."""
    import jax

    if device is None:
        devices = jax.local_devices()
        if not devices:
            return None
        device = devices[0]
    try:
        raw = device.memory_stats()
    except Exception:
        return None
    if not raw:
        return None
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    out = {k: float(raw[k]) for k in keys if k in raw}
    return out or None


def format_memory_stats(stats: Optional[Dict[str, float]]) -> str:
    """Human-readable one-liner, e.g. ``HBM 3.21/16.00 GiB (peak 4.87)``."""
    if not stats:
        return "HBM stats unavailable"
    gib = 1024.0 ** 3
    used = stats.get("bytes_in_use")
    limit = stats.get("bytes_limit")
    peak = stats.get("peak_bytes_in_use")
    parts = []
    if used is not None:
        parts.append(f"{used / gib:.2f}")
    if limit:
        parts.append(f"/{limit / gib:.2f}")
    s = "HBM " + "".join(parts) + " GiB" if parts else "HBM"
    if peak is not None:
        s += f" (peak {peak / gib:.2f})"
    return s


def peak_hbm_gb(device=None) -> Optional[float]:
    """Peak HBM bytes-in-use in GiB, or None when unavailable."""
    stats = device_memory_stats(device)
    if not stats or "peak_bytes_in_use" not in stats:
        return None
    return stats["peak_bytes_in_use"] / 1024.0 ** 3


__all__ = ["device_memory_stats", "format_memory_stats", "peak_hbm_gb"]
