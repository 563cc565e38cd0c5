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


def _default_cache_dir() -> str:
    """Prefer a repo-local cache over $HOME.

    $HOME does not survive the round-driver's container churn, so a
    home-dir cache forces the flagship famfinder program through its
    ~390s remote compile in every fresh driver bench (BENCH_r02/r03
    tails).  The source tree DOES persist; a cache next to it makes
    programs compiled in one session hit in the next process — and
    the next round.  Falls back to ~/.cache when the tree isn't
    writable (installed package)."""
    repo = Path(__file__).resolve().parent.parent
    d = repo / ".jax_cache"
    try:
        d.mkdir(parents=True, exist_ok=True)
        probe = d / ".w"
        probe.touch()
        probe.unlink()
        return str(d)
    except OSError:
        return str(Path.home() / ".cache" / "sina_tpu" / "jax_cache")


def setup_jax(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    d = cache_dir or os.environ.get(
        "SINA_JAX_CACHE", _default_cache_dir()
    )
    try:
        Path(d).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:  # cache is best-effort
        pass
    _patch_mosaic_debuginfo()
    _register_compile_listener()


def _patch_mosaic_debuginfo() -> None:
    """Strip source locations from serialized Mosaic (Pallas) payloads.

    JAX's persistent compile cache canonicalises the outer StableHLO
    with ``strip-debuginfo`` before hashing, but a Pallas kernel's
    Mosaic module is serialized into the custom_call backend_config
    *with* debug info (tpu_custom_call.py: write_bytecode of the
    lowered module).  Locations include the whole caller stack, so
    editing ANY line above a pallas_call callsite changes the payload
    bytes and silently invalidates every cached program containing the
    kernel — a ~17 min famfinder recompile on the tunneled backend per
    source edit.  Prepending strip-debuginfo to the mosaic-serde
    pipeline makes the payload (and the cache key) depend only on the
    computation.  Mosaic uses locations only for error messages.

    Best-effort: any jax-internals drift leaves the stock behavior.
    Disable with SINA_TPU_STRIP_MOSAIC_DEBUG=0.
    """
    if os.environ.get("SINA_TPU_STRIP_MOSAIC_DEBUG", "1") == "0":
        return
    try:
        import io

        import jax._src.tpu_custom_call as tcc

        PassManager = tcc.PassManager
        tpu = tcc.tpu

        def _lower_stripped(module, *, ir_version=None):
            has_comm = tpu.private_has_communication(module.operation)
            with module.context as ctx, module.operation.location as _:
                module_op = module.operation.clone()
                prev = ctx.allow_unregistered_dialects
                ctx.allow_unregistered_dialects = True
                tv = (
                    f"target-version={ir_version}"
                    if ir_version is not None
                    else ""
                )
                try:
                    pipeline = PassManager.parse(
                        "builtin.module(strip-debuginfo,"
                        "mosaic-serde{serialize=true " + tv + "})"
                    )
                    pipeline.run(module_op)
                finally:
                    ctx.allow_unregistered_dialects = prev
                buf = io.BytesIO()
                module_op.write_bytecode(buf, desired_version=0)
                return buf.getvalue(), has_comm

        # Only patch if the function still has the expected signature.
        import inspect

        sig = inspect.signature(tcc._lower_mosaic_module_to_asm)
        if list(sig.parameters) == ["module", "ir_version"]:
            tcc._lower_mosaic_module_to_asm = _lower_stripped
    except Exception:
        pass


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


_cache_hits = 0
_cache_misses = 0
_midrun_compiles = 0
_midrun_compile_secs = 0.0


def midrun_compile_stats() -> tuple[int, float]:
    """(count, total seconds) of backend compiles seen AFTER
    mark_warmup_done().  One ~2.5s shape-bucket compile landing in a
    short timed phase halves a 100k bench number (measured 122.7 vs
    277 warm) — bench.py puts this in its JSON line so a poisoned
    capture identifies itself."""
    return _midrun_compiles, _midrun_compile_secs


def cache_stats() -> tuple[int, int]:
    """(persistent-compile-cache hits, misses) seen this process.

    The r3 Mosaic debug-info fix claimed cross-process hits but
    nothing VERIFIED one in a fresh process (VERDICT r3 weak #4);
    these counters make a drift visible: bench.py prints them in its
    tail, and tests/test_jax_setup.py asserts a second process hits."""
    return _cache_hits, _cache_misses


def _register_compile_listener() -> None:
    import logging

    import jax.monitoring

    log = logging.getLogger("sina.jax")

    def on_event(name: str, dur: float, **kw) -> None:
        if not name.endswith("backend_compile_duration"):
            return
        if _after_warmup:
            global _midrun_compiles, _midrun_compile_secs
            _midrun_compiles += 1
            _midrun_compile_secs += dur
            log.warning(
                "mid-run XLA compile took %.1fs — a new kernel "
                "shape bucket was hit after warmup (check batch/"
                "width bucketing if this repeats)", dur,
            )
        elif dur >= 5.0:
            log.info("XLA compile: %.1fs (warmup)", dur)

    jax.monitoring.register_event_duration_secs_listener(on_event)

    def on_named(name: str, **kw) -> None:
        global _cache_hits, _cache_misses
        if name == "/jax/compilation_cache/cache_hits":
            _cache_hits += 1
        elif name == "/jax/compilation_cache/cache_misses":
            _cache_misses += 1

    jax.monitoring.register_event_listener(on_named)
