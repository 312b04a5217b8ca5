"""Named timers (reference utils.py:77-140, device-fenced).

The reference wraps start/stop in torch.cuda.synchronize; the JAX analog
fences with block_until_ready on a marker array when requested (on the
tunneled runtime a tiny host transfer is the reliable fence).
"""

from __future__ import annotations

import time
from typing import Dict


def device_fence():
    import jax
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros(()))  # full host sync


class Timer:
    def __init__(self, name: str, fence: bool = False):
        self.name = name
        self.fence = fence
        self.elapsed_ = 0.0
        self.started = False
        self._t0 = 0.0

    def start(self):
        assert not self.started
        if self.fence:
            device_fence()
        self._t0 = time.time()
        self.started = True

    def stop(self):
        assert self.started
        if self.fence:
            device_fence()
        self.elapsed_ += time.time() - self._t0
        self.started = False

    def reset(self):
        self.elapsed_ = 0.0
        self.started = False

    def elapsed(self, reset: bool = True) -> float:
        e = self.elapsed_
        if reset:
            self.reset()
        return e


class Timers:
    def __init__(self, fence: bool = False):
        self.timers: Dict[str, Timer] = {}
        self.fence = fence

    def __call__(self, name: str) -> Timer:
        if name not in self.timers:
            self.timers[name] = Timer(name, self.fence)
        return self.timers[name]

    def log(self, names, normalizer: float = 1.0, reset: bool = True) -> str:
        fields = []
        for n in names:
            if n in self.timers:
                ms = self.timers[n].elapsed(reset=reset) * 1000.0 / normalizer
                fields.append(f"{n}: {ms:.2f}")
        return " | ".join(fields)
