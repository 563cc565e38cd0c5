"""jax_setup: compile-cache wiring + Mosaic debug-info stripping."""

import numpy as np


def test_mosaic_debuginfo_patch_applies():
    # The patch must either apply cleanly (function replaced) or
    # no-op (jax internals drifted); never raise.
    from sina_tpu.jax_setup import _patch_mosaic_debuginfo

    _patch_mosaic_debuginfo()
    import jax._src.tpu_custom_call as tcc

    fn = tcc._lower_mosaic_module_to_asm
    assert fn.__name__ in (
        "_lower_stripped",
        "_lower_mosaic_module_to_asm",
    )


def test_pallas_interpret_unaffected():
    # CPU tests exercise Pallas in interpret mode, which bypasses the
    # Mosaic serialisation path entirely — the patch must not break
    # kernel execution there.
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from sina_tpu.jax_setup import _patch_mosaic_debuginfo

    _patch_mosaic_debuginfo()

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=True,
    )(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2.0)
