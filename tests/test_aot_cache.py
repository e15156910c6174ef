"""
AOT executable cache: key discipline and round-trip.

The cache must never serve an executable compiled for different
argument avals (the delta-compression exception count varies per
dataset) or different trace-time constants — see the round-5
hardening in utils/aot_cache.py.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ska_sdp_cip_tpu.utils import aot_cache


def test_args_fingerprint_distinguishes_shapes_and_dtypes():
    a = (jnp.zeros(4, jnp.float32),)
    b = (jnp.zeros(5, jnp.float32),)
    c = (jnp.zeros(4, jnp.int32),)
    d = ({"x": jnp.zeros(4, jnp.float32)},)
    fps = {
        aot_cache.args_fingerprint(args) for args in (a, b, c, d)
    }
    assert len(fps) == 4
    # Deterministic for equal specs
    assert aot_cache.args_fingerprint(a) == aot_cache.args_fingerprint(
        (jnp.ones(4, jnp.float32),)
    )


def test_cache_key_folds_constants_and_code():
    k1 = aot_cache.cache_key("role", (1, 2), 0.5)
    k2 = aot_cache.cache_key("role", (1, 2), 0.6)
    k3 = aot_cache.cache_key("other", (1, 2), 0.5)
    assert len({k1, k2, k3}) == 3
    assert k1 == aot_cache.cache_key("role", (1, 2), 0.5)


def test_cached_jit_roundtrip_and_stats(tmp_path):
    calls = dict(aot_cache.STATS)

    def fn(x):
        return x * 2.0 + 1.0

    # Pin to one device: the conftest's 8-device CPU mesh would
    # otherwise compile an executable expecting 8 input shards.
    dev = jax.devices()[0]
    args = (jax.device_put(jnp.arange(8, dtype=jnp.float32), dev),)
    key = aot_cache.cache_key("test_fn")
    out1 = np.asarray(
        aot_cache.cached_jit(fn, args, key, cache_dir=tmp_path)(*args)
    )
    assert aot_cache.STATS["misses"] == calls["misses"] + 1
    out2 = np.asarray(
        aot_cache.cached_jit(fn, args, key, cache_dir=tmp_path)(*args)
    )
    np.testing.assert_array_equal(out1, out2)
    # Second build either hits the cache or (if this backend cannot
    # serialize executables) records an error and recompiled — both
    # keep results correct; a silent stale hit is what must not
    # happen, and the shape-distinct key test above covers that.
    assert (
        aot_cache.STATS["hits"] == calls["hits"] + 1
        or aot_cache.STATS["errors"] > calls["errors"]
    )
    # Different arg shapes under the same semantic key must MISS.
    args2 = (
        jax.device_put(jnp.arange(16, dtype=jnp.float32), dev),
    )
    misses = aot_cache.STATS["misses"]
    np.asarray(
        aot_cache.cached_jit(fn, args2, key, cache_dir=tmp_path)(
            *args2
        )
    )
    assert aot_cache.STATS["misses"] == misses + 1
