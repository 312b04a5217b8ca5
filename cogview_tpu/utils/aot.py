"""AOT program store: compiled XLA executables serialized to disk.

The persistent compile cache (utils/compile_cache.py) removes backend
*compile* time on a warm start, but a restarted server still pays Python
trace + StableHLO lowering (tens of seconds for the filling loop — see the
cold-start breakdown in ``filling_sequence_cold_start``) before the cache
is even consulted.  This module snapshots the *loaded executable* produced
by ``jit(...).lower(...).compile()`` via
``jax.experimental.serialize_executable``, keyed by the program's input
shapes + statics + backend identity, so a process restart skips trace,
lowering AND compile: one pickle read + executable load.

Reference behavior matched: interactive generation pays model setup + first
forward on every launch (/root/reference/generate_samples.py:75-106); here
`cli/serve --aot-dir` makes a restarted server's first query a plain
program load.

Safety: executables are backend- and machine-specific.  The key includes
jax version, platform, and device kind; for CPU backends it additionally
includes the host name, because XLA:CPU AOT artifacts bake in host ISA
features and can SIGILL on a different machine (the same hazard
utils/compile_cache.py guards against).  A store entry that fails to
deserialize is treated as a miss and overwritten.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import platform as _platform
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jaxlib

_FORMAT_VERSION = 1
_logger = logging.getLogger(__name__)


def _backend_identity() -> str:
    dev = jax.devices()[0]
    ident = f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
    if dev.platform == "cpu":
        # XLA:CPU AOT results bake in host ISA features -> host-specific
        ident += f":{_platform.node()}:{_platform.machine()}"
    return ident


def _abstract_desc(tree: Any) -> str:
    """Canonical 'shapes+dtypes+treedef' string for the dynamic arguments."""
    leaves, treedef = jax.tree.flatten(tree)
    parts = []
    for leaf in leaves:
        aval = jax.api_util.shaped_abstractify(leaf)
        parts.append(f"{aval.dtype.name}{list(aval.shape)}")
    return f"{treedef}|{';'.join(parts)}"


def program_key(dyn_args: Any, statics: Sequence[Any], fn_id: str = "") -> str:
    """Stable content key for one (program, argument-shapes) pairing.

    ``fn_id`` is the target function's identity (qualified name): two
    different jitted programs sharing one store directory with
    coincidentally matching signatures must not collide.  jaxlib's version
    is mixed in too — a jaxlib-only upgrade changes the executable format
    without changing jax.__version__."""
    desc = "|".join(
        [
            f"v{_FORMAT_VERSION}",
            jax.__version__,
            jaxlib.__version__,
            fn_id,
            _backend_identity(),
            _abstract_desc(dyn_args),
            repr(tuple(statics)),
        ]
    )
    return hashlib.sha256(desc.encode()).hexdigest()[:32]


class ProgramStore:
    """Directory of serialized executables, one ``<key>.aot`` pickle each."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        # key -> loaded/compiled callable.  Without this, every call paid
        # a pickle read + deserialize_and_load (the dominant cold-start
        # phase on the tunneled TPU runtime), making a warmed server
        # SLOWER per query than the plain jit cache.  With it, repeat
        # calls in one process never touch disk.
        self._memo: dict = {}

    def _path(self, key: str) -> str:
        return os.path.join(self.directory, f"{key}.aot")

    def load(self, key: str) -> Optional[Callable]:
        """-> loaded executable callable, or None on miss/corruption."""
        path = self._path(key)
        if not os.path.exists(path):
            return None
        try:
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as fh:
                version, n_devices, payload, in_tree, out_tree = pickle.load(fh)
            if version != _FORMAT_VERSION:
                return None
            # deserialize_and_load defaults execution_devices to ALL local
            # devices; under a forced multi-device host (the 8-way virtual
            # CPU test mesh) that mismatches a single-device program, so pin
            # the same device count the executable was compiled for.
            devices = jax.devices()
            if n_devices and n_devices <= len(devices):
                devices = devices[:n_devices]
            return se.deserialize_and_load(
                payload, in_tree, out_tree, execution_devices=devices
            )
        except (OSError, pickle.UnpicklingError, ValueError, TypeError,
                EOFError, ImportError, AttributeError) as exc:
            # stale jaxlib, truncated write, foreign machine: recompile.
            # Log the eviction — a persistently-missing store (e.g. an
            # internals change making every load fail) must be diagnosable,
            # not look like it works while recompiling every restart.
            _logger.warning(
                "aot store: evicting %s (%s: %s); recompiling",
                path, type(exc).__name__, exc,
            )
            try:
                os.remove(path)
            except OSError:
                pass
            return None

    def save(self, key: str, compiled) -> None:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        try:
            n_devices = len(compiled._executable.xla_executable.local_devices())
        except AttributeError:  # jax internals moved: fall back to default
            n_devices = 0
        tmp = self._path(key) + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(
                (_FORMAT_VERSION, n_devices, payload, in_tree, out_tree), fh
            )
        os.replace(tmp, self._path(key))  # atomic: readers never see partial

    def get_or_compile(
        self,
        jit_fn,
        args: Tuple[Any, ...],
        static_positions: Sequence[int],
    ) -> Tuple[Any, dict]:
        """Run ``jit_fn(*args)`` through the store.

        ``static_positions`` are the indices of ``args`` that are static
        under the jit wrapper (they become part of the key; the rest are
        passed to the loaded executable positionally).  Returns
        ``(outputs, info)`` with info['source'] in {'aot', 'compiled'}.
        """
        import time

        static_positions = set(static_positions)
        dyn = [a for i, a in enumerate(args) if i not in static_positions]
        statics = [repr(a) for i, a in enumerate(args) if i in static_positions]
        fn_id = getattr(jit_fn, "__qualname__", None) or getattr(
            jit_fn, "__name__", repr(jit_fn))
        key = program_key(tuple(dyn), statics, fn_id=fn_id)

        cached = self._memo.get(key)
        if cached is not None:
            return cached(*dyn), {"source": "memory", "key": key}

        t0 = time.time()
        loaded = self.load(key)
        if loaded is not None:
            self._memo[key] = loaded
            out = loaded(*dyn)
            return out, {
                "source": "aot",
                "key": key,
                "load_s": round(time.time() - t0, 2),
            }

        lowered = jit_fn.lower(*args)
        compiled = lowered.compile()
        self.save(key, compiled)
        self._memo[key] = compiled
        out = compiled(*dyn)
        return out, {
            "source": "compiled",
            "key": key,
            "compile_s": round(time.time() - t0, 2),
        }
