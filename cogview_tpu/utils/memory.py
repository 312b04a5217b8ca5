"""Device-memory reporting (reference utils.py:143-155 report_memory)."""

from __future__ import annotations

from typing import Dict, Optional


def device_memory_stats() -> Optional[Dict[str, float]]:
    import jax

    d = jax.devices()[0]
    stats = d.memory_stats() if hasattr(d, "memory_stats") else None
    if not stats:
        return None
    gb = 1024.0 ** 3
    return {
        "bytes_in_use_gb": stats.get("bytes_in_use", 0) / gb,
        "peak_bytes_in_use_gb": stats.get("peak_bytes_in_use", 0) / gb,
        "bytes_limit_gb": stats.get("bytes_limit", 0) / gb,
    }


def report_memory(name: str = "") -> str:
    stats = device_memory_stats()
    if stats is None:
        return f"memory ({name}) | unavailable on this backend"
    return (
        f"memory ({name}) | in-use: {stats['bytes_in_use_gb']:.2f} GB | "
        f"peak: {stats['peak_bytes_in_use_gb']:.2f} GB | "
        f"limit: {stats['bytes_limit_gb']:.2f} GB"
    )


def print_args(args) -> None:
    """Startup flag dump (reference utils.py:48-56)."""
    print("arguments:", flush=True)
    for key in sorted(vars(args)):
        dots = "." * max(1, 32 - len(key))
        print(f"  {key} {dots} {getattr(args, key)}", flush=True)
