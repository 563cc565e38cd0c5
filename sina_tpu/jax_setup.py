"""JAX runtime configuration.

The remote-compile path of tunneled TPU backends makes every new
(shape-bucket, kernel) compilation cost minutes; the persistent
compilation cache amortises that across processes.  Imported by the
pipeline/bench entry points before any jit executes.
"""

from __future__ import annotations

import os
from pathlib import Path

_done = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    d = cache_dir or os.environ.get(
        "SINA_JAX_CACHE",
        str(Path.home() / ".cache" / "sina_tpu" / "jax_cache"),
    )
    try:
        Path(d).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:  # cache is best-effort
        pass
    _register_compile_listener()


_after_warmup = False


def mark_warmup_done() -> None:
    """Called by the pipeline/bench once steady state is reached:
    any backend compile after this point is a shape-bucket drift
    (the '1 seq/s because a kernel recompiled mid-run' failure
    mode) and is logged loudly instead of silently eating minutes."""
    global _after_warmup
    _after_warmup = True


def warmed_up() -> bool:
    return _after_warmup


def _register_compile_listener() -> None:
    import logging

    import jax.monitoring

    log = logging.getLogger("sina.jax")

    def on_event(name: str, dur: float, **kw) -> None:
        if not name.endswith("backend_compile_duration"):
            return
        if _after_warmup:
            log.warning(
                "mid-run XLA compile took %.1fs — a new kernel "
                "shape bucket was hit after warmup (check batch/"
                "width bucketing if this repeats)", dur,
            )
        elif dur >= 5.0:
            log.info("XLA compile: %.1fs (warmup)", dur)

    jax.monitoring.register_event_duration_secs_listener(on_event)
