"""AOT executable cache: key stability, store/load, fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from draco_tpu.ops import aotcache


def _lower(pad_lines: int):
    """Lower the same computation defined at a shifted source line."""
    src = "\n" * pad_lines + (
        "def f(x, y):\n"
        "    import jax.numpy as jnp\n"
        "    return jnp.sin(x) @ y\n"
    )
    ns: dict = {}
    exec(compile(src, "probe.py", "exec"), ns)
    return jax.jit(ns["f"]).lower(jnp.ones((32, 32)), jnp.ones((32, 32)))


def test_key_ignores_source_line_shifts():
    """Line shifts must not invalidate entries (StableHLO loc metadata
    is stripped before hashing) — a cosmetic edit anywhere in the repo
    would otherwise cold-compile every cached program."""
    assert aotcache._stable_key(_lower(0)) == aotcache._stable_key(_lower(30))


def test_key_distinguishes_computations():
    l1 = jax.jit(lambda x: x + 1.0).lower(jnp.ones(8))
    l2 = jax.jit(lambda x: x + 2.0).lower(jnp.ones(8))
    assert aotcache._stable_key(l1) != aotcache._stable_key(l2)


def test_store_load_and_corrupt_fallback(tmp_path):
    """Store/load round trip + corrupt-entry fallback, on a 1-device
    backend in a subprocess (deserialized executables rebind to all
    local devices, so the 8-virtual-device test env itself disables the
    cache — see aotcache.cache_dir)."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import os
        os.environ["XLA_FLAGS"] = ""
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        import jax.numpy as jnp
        from draco_tpu.ops import aotcache

        def lower():
            return jax.jit(lambda x, y: jnp.sin(x) @ y).lower(
                jnp.ones((32, 32)), jnp.ones((32, 32))
            )

        assert aotcache.cache_dir() is not None
        c1 = aotcache.compile_cached(lower(), "t")
        import glob
        entries = glob.glob(os.path.join(os.environ[
            "DRACO_TPU_AOT_CACHE_DIR"], "t-*.aot"))
        assert len(entries) == 1, entries
        c2 = aotcache.compile_cached(lower(), "t")
        x = jnp.ones((32, 32))
        np.testing.assert_allclose(
            np.asarray(c1(x, x)), np.asarray(c2(x, x)), rtol=1e-6
        )
        # corrupt the entry: load must fall back to a fresh compile
        with open(entries[0], "wb") as f:
            f.write(b"garbage")
        c3 = aotcache.compile_cached(lower(), "t")
        assert np.isfinite(np.asarray(c3(x, x))).all()
        print("AOTOK")
        """
    )
    env = dict(
        __import__("os").environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="",
        DRACO_TPU_AOT_CACHE_DIR=str(tmp_path),
    )
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=180,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "AOTOK" in r.stdout


def test_disabled_via_env(tmp_path, monkeypatch):
    monkeypatch.setenv("DRACO_TPU_AOT_CACHE", "0")
    assert aotcache.cache_dir() is None
    c = aotcache.compile_cached(_lower(0), "t")
    assert np.isfinite(
        np.asarray(c(jnp.ones((32, 32)), jnp.ones((32, 32))))
    ).all()
