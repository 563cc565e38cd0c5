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
