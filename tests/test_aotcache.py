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
    assert aotcache._stable_key(_lower(0).as_text()) == aotcache._stable_key(
        _lower(30).as_text()
    )


def test_key_distinguishes_computations():
    l1 = jax.jit(lambda x: x + 1.0).lower(jnp.ones(8))
    l2 = jax.jit(lambda x: x + 2.0).lower(jnp.ones(8))
    assert aotcache._stable_key(l1.as_text()) != aotcache._stable_key(
        l2.as_text()
    )


def test_key_varies_with_xla_flags(monkeypatch):
    """XLA flags affect compiled numerics/perf but NOT deserialization —
    a flags change must produce a different key or a stale executable
    would be silently reused."""
    t = _lower(0).as_text()
    monkeypatch.setenv("XLA_FLAGS", "--xla_probe_flag_a")
    k1 = aotcache._stable_key(t)
    monkeypatch.setenv("XLA_FLAGS", "--xla_probe_flag_b")
    k2 = aotcache._stable_key(t)
    assert k1 != k2


def test_rebind_safety_gate():
    """Single-device programs are cacheable only on a 1-device backend;
    full-backend meshed programs are cacheable; subset programs never.
    (This test env has 8 virtual CPU devices.)"""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n = jax.local_device_count()
    single = _lower(0).as_text()
    assert aotcache._rebind_safe(single) == (n == 1)
    if n >= 8:
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("a", "b"))
        sh = NamedSharding(mesh, P("a", "b"))
        x = jax.device_put(jnp.ones((8, 8)), sh)
        meshed = (
            jax.jit(lambda v: v * 2, in_shardings=sh, out_shardings=sh)
            .lower(x)
            .as_text()
        )
        assert aotcache._rebind_safe(meshed) == (n == 8)


def test_meshed_store_load_roundtrip(tmp_path):
    """A FULL-backend meshed executable must round-trip through the
    cache across processes with values and output sharding intact —
    the round-4 lift of the multi-device self-disable."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import os
        import numpy as np
        import jax, jax.numpy as jnp
        jax.config.update("jax_platforms", "cpu")
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from draco_tpu.ops import aotcache

        mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("a", "b"))
        sh = NamedSharding(mesh, P("a", "b"))
        x = jax.device_put(jnp.arange(64.0).reshape(8, 8) / 64.0, sh)

        def lower():
            return jax.jit(
                lambda v: jnp.sin(v) @ v.T, in_shardings=sh,
                out_shardings=NamedSharding(mesh, P("a", None)),
            ).lower(x)

        c = aotcache.compile_cached(lower(), "meshprobe")
        out = c(x)
        import glob
        entries = glob.glob(os.path.join(
            os.environ["DRACO_TPU_AOT_CACHE_DIR"], "meshprobe-*.aot"))
        assert len(entries) == 1, entries
        np.save(os.environ["PROBE_REF"], np.asarray(out))
        print("STORED" if os.environ["PROBE_MODE"] == "store" else "LOADED",
              out.sharding.spec)
        """
    )
    import os

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        DRACO_TPU_AOT_CACHE_DIR=str(tmp_path),
        PROBE_MODE="store",
        PROBE_REF=str(tmp_path / "ref.npy"),
    )
    r1 = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=180,
    )
    assert r1.returncode == 0, r1.stdout[-2000:] + r1.stderr[-2000:]
    env2 = dict(env, PROBE_MODE="load", PROBE_REF=str(tmp_path / "ref2.npy"))
    r2 = subprocess.run(
        [sys.executable, "-c", code], env=env2, capture_output=True,
        text=True, timeout=180,
    )
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "PartitionSpec('a'" in r2.stdout  # sharded output preserved
    a = np.load(tmp_path / "ref.npy")
    b = np.load(tmp_path / "ref2.npy")
    np.testing.assert_allclose(a, b, rtol=1e-6)


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
