"""Small shared utilities for the host-side pipeline."""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict

import numpy as np


def setup_compile_cache(platform: str | None = None) -> str:
    """Enable the persistent XLA compile cache in a per-platform dir.

    A single shared /tmp/jax_cache serving CPU and TPU backends from
    concurrent processes has produced corrupt entries that segfault the
    reader deep inside jax's compilation-cache path.  Keying the dir by
    (platform, jaxlib version) keeps backends and incompatible jaxlib
    builds from sharing files; a corrupt dir can be deleted without
    nuking the other platform's warm cache.  Returns the dir used.
    Call AFTER the platform is pinned (conftest / ensure_live_backend).
    """
    import jax

    if platform is None:
        # jax_platforms config reflects any in-process override; fall
        # back to the env var, then to "any" (never triggers backend
        # init, which can hang on a wedged tunnel)
        import os

        platform = (jax.config.jax_platforms
                    or os.environ.get("JAX_PLATFORMS") or "any")
        platform = platform.split(",")[0].strip() or "any"
    import jaxlib

    cache_dir = f"/tmp/jax_cache_{platform}_{jaxlib.__version__}"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir


def ensure_live_backend(timeout_s: float = 300.0) -> str:
    """Force the CPU backend if the default one cannot initialize.

    The axon TPU tunnel, when wedged, makes jax.devices() block forever
    (or error only after ~20 min) — and the image's sitecustomize
    overrides JAX_PLATFORMS at interpreter startup, so the env var alone
    cannot save a script.  Probes backend init in a SUBPROCESS with a
    hard timeout and, on failure, applies the in-process config update
    that actually wins over sitecustomize.  Returns the platform name
    the current process will use.  Call before any jax dispatch."""
    import os
    import subprocess
    import sys

    import jax

    if os.environ.get("ORB_FORCE_CPU", "0") == "1":
        # explicit CPU pin (e.g. verify scripts running beside a TPU
        # bench — two processes sharing the tunnel serialize each other)
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    try:
        # probe an actual computation, not just device enumeration: a
        # wedged tunnel still lists devices instantly (metadata is
        # cached client-side) while every dispatch blocks forever
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; jax.devices(); "
             "assert float(jnp.float32(1.0) + 1.0) == 2.0"],
            timeout=timeout_s, capture_output=True,
        )
        alive = r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        alive = False
    if not alive:
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    return jax.devices()[0].platform


def bucket_size(n: int, minimum: int = 128) -> int:
    """Round up to a power of two (>= minimum) to bound XLA recompiles.

    Dynamic work sizes (local-map points, BA edge counts, ...) are padded
    to bucketed shapes so each bucket compiles once.
    """
    b = minimum
    while b < n:
        b *= 2
    return b


class StickyBuckets:
    """Monotone bucket sizes: once a dimension has used a bucket, smaller
    requests reuse it.  Each named dimension therefore recompiles at most
    log2(max/min) times over the whole run (compile time >> padding cost
    on TPU)."""

    def __init__(self, **minimums: int):
        self._min = dict(minimums)
        self._cur: Dict[str, int] = {}

    def __call__(self, name: str, n: int) -> int:
        b = bucket_size(n, self._min.get(name, 128))
        b = max(b, self._cur.get(name, 0))
        self._cur[name] = b
        return b


def fetch_async(tree) -> None:
    """Wait for device results AND start their d2h transfer.

    `jax.block_until_ready` alone only waits for the computation; the
    first host read (np.asarray) then pays a full tunnel round trip per
    array, serially.  Starting `copy_to_host_async` on every leaf first
    lands the host copies in parallel with the wait, so the subsequent
    unpack/apply (often under store.lock) reads cached buffers instead
    of the tunnel."""
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "copy_to_host_async")]
    for x in leaves:
        try:
            x.copy_to_host_async()
        except Exception:
            pass
    jax.block_until_ready(leaves)


def pad_rows(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    """Pad (or truncate) axis 0 of `a` to length n with `fill`."""
    if a.shape[0] == n:
        return a
    if a.shape[0] > n:
        return a[:n]
    pad_shape = (n - a.shape[0],) + a.shape[1:]
    return np.concatenate([a, np.full(pad_shape, fill, dtype=a.dtype)])


class StageTimers:
    """Per-stage wall-clock accumulation (SURVEY.md §5.1: the reference
    only times whole Track* calls in its drivers; we time every stage)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.samples: Dict[str, list] = defaultdict(list)

    class _Ctx:
        def __init__(self, parent, name):
            self.parent, self.name = parent, name

        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            self.parent.totals[self.name] += dt
            self.parent.counts[self.name] += 1
            self.parent.samples[self.name].append(dt)
            return False

    def __call__(self, name: str) -> "StageTimers._Ctx":
        return self._Ctx(self, name)

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals):
            n = self.counts[k]
            s = sorted(self.samples[k])
            med = s[len(s) // 2] if s else 0.0
            lines.append(
                f"{k:32s} total {self.totals[k]:8.3f}s  n={n:5d}  "
                f"median {med * 1e3:8.2f}ms"
            )
        return "\n".join(lines)
