"""On-disk AOT cache of compiled XLA executables.

JAX's persistent compilation cache keys on (computation, jaxlib,
backend fingerprint, XLA flags, compile options, device topology).
Over the remote-TPU tunnel the backend-derived components have been
observed to drift between sessions, silently turning every warm start
into a multi-minute cold compile (BENCH_r02: 522.8 s warmup with a
populated cache).  This module bypasses the key problem entirely:

* the cache key is OURS — a hash of the lowered StableHLO text (fully
  deterministic given code + shapes) plus jaxlib version and device
  kind;
* the value is the serialized compiled executable
  (``jax.experimental.serialize_executable``, PJRT executable
  serialization — measured sub-millisecond round trip on the tunnel);
* any deserialization failure (backend rebuilt, incompatible payload)
  falls back to a normal compile and overwrites the entry.

Used by the fused round-trip programs (telescope/roundtrip.py) whose
cold compiles dominate bench warmup.  Disable with
``DRACO_TPU_AOT_CACHE=0``; directory override via
``DRACO_TPU_AOT_CACHE_DIR`` (default ``<repo>/.jax_cache/aot``).
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile

logger = logging.getLogger(__name__)

#: Per-process cache telemetry, read by ``bench.py`` to attribute warmup
#: time (round-4 post-mortem: a 776 s headline start could not be told
#: apart from a wedged tunnel because nothing recorded hit vs miss).
#: Each event is ``(program name, seconds)``.
STATS: dict = {"hits": [], "misses": [], "load_failures": [], "rejects": []}

_DEF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
    "aot",
)


def cache_dir() -> str | None:
    if os.environ.get("DRACO_TPU_AOT_CACHE", "1") in ("0", ""):
        return None
    return os.environ.get("DRACO_TPU_AOT_CACHE_DIR", _DEF_DIR)


def _rebind_safe(text: str) -> bool:
    """Whether a deserialized executable would rebind correctly here.

    ``deserialize_and_load`` rebinds the executable to ALL local
    devices in default order, so caching is safe exactly when the
    program's device footprint (num_partitions x num_replicas from the
    lowered module) covers every local device — the single-device case
    AND single-process meshed programs spanning the full backend
    (verified by round-trip tests in tests/test_aotcache.py).  A
    single-device program on a multi-device backend would load back
    expecting N input shards; a multi-process program's global devices
    cannot be re-addressed from one process.  Both fall back to a
    plain compile.
    """
    import re

    import jax

    # Scan the whole module header, not a truncated prefix: long
    # attribute dictionaries (meshed programs with big frontend
    # attributes) can push the num_partitions line past any fixed
    # offset, which would silently mis-classify the program.
    nums = [
        int(n)
        for n in re.findall(
            r"mhlo\.num_(?:partitions|replicas) = (\d+)", text
        )
    ]
    footprint = 1
    for n in nums[:2]:
        footprint *= n
    if jax.process_count() > 1:
        return False
    return footprint == jax.local_device_count()


def _device_order_tag() -> str:
    """Local device ids in backend order; part of every cache key so a
    backend whose device numbering changed across sessions invalidates
    cleanly instead of failing at load."""
    import jax

    return ",".join(str(d.id) for d in jax.local_devices())


def _assignment_matches_default(lowered) -> bool:
    """Whether the lowering's device assignment is the default order.

    ``deserialize_and_load`` rebinds a cached executable to the local
    devices in DEFAULT order, unconditionally.  A mesh built with a
    permuted device order (e.g. topology-aware ``create_device_mesh``)
    passes the footprint check but would rebind wrongly on load — so
    such programs must not enter the cache at all.  The assignment is
    read from the lowering's private compile args; if unavailable,
    assume default (single-device programs always are).
    """
    try:
        ca = lowered._lowering.compile_args  # noqa: SLF001
        da = ca.get("device_assignment") if hasattr(ca, "get") else None
        if da is None:
            return True
        import jax

        ids = [getattr(d, "id", d) for d in da]
        if len(ids) <= 1:
            return True
        return ids == [d.id for d in jax.local_devices()[: len(ids)]]
    except Exception:  # pragma: no cover - private-API drift
        return True


def _stable_key(text: str, extra: str = "") -> str:
    """Deterministic key: StableHLO text + jaxlib + device kind.

    Deliberately EXCLUDES the tunnel-session-variant backend components
    (platform_version build strings, device topology coords) that are
    suspected of breaking jax's own persistent-cache key; if the
    backend genuinely changed incompatibly, deserialization fails and
    we fall back to a fresh compile anyway.
    """
    import re

    import jax

    # Strip source-location metadata before hashing: StableHLO embeds
    # file:line locs, so ANY line shift in an involved module would
    # otherwise invalidate every entry even when the computation is
    # unchanged.  The stripping need not be a perfect parse — only
    # deterministic.
    text = re.sub(r"loc\([^\n]*?\)", "", text)
    text = re.sub(r"#loc\d*( = .*)?", "", text)
    h = hashlib.sha256()
    h.update(text.encode())
    h.update(jax.lib.__version__.encode())
    dev = jax.devices()[0]
    h.update(dev.device_kind.encode())
    h.update(str(jax.device_count()).encode())
    # Numerics/perf-affecting environment: unlike backend drift, a flags
    # change does NOT make deserialization fail (the payload is
    # self-contained), so an executable compiled under different XLA
    # flags would be silently reused unless keyed here.
    h.update(os.environ.get("XLA_FLAGS", "").encode())
    h.update(os.environ.get("LIBTPU_INIT_ARGS", "").encode())
    if dev.platform == "cpu":
        # XLA:CPU AOT results are machine-feature specific (a cache dir
        # shared across hosts could otherwise SIGILL); TPU keys stay
        # host-independent on purpose.
        import platform as _platform

        h.update(_platform.machine().encode())
        h.update(_platform.processor().encode())
    h.update(extra.encode())
    return h.hexdigest()[:32]


def compile_cached(lowered, name: str, extra_key: str = ""):
    """Compile ``lowered`` (a ``jax.stages.Lowered``), AOT-cached.

    Returns a callable executable (``jax.stages.Compiled`` or the
    deserialized equivalent).  On a cache hit the multi-minute XLA
    compile is replaced by a sub-second executable load.
    """
    import time as _time

    t0 = _time.time()
    cdir = cache_dir()
    if cdir is None:
        return lowered.compile()
    try:
        text = lowered.as_text()
        if not _rebind_safe(text) or not _assignment_matches_default(
            lowered
        ):
            STATS["rejects"].append((name, round(_time.time() - t0, 2)))
            return lowered.compile()
        key = _stable_key(text, extra_key + "|dev:" + _device_order_tag())
    except Exception as e:  # pragma: no cover - defensive
        logger.warning("aot cache key failed (%s); compiling", e)
        return lowered.compile()
    path = os.path.join(cdir, f"{name}-{key}.aot")
    if os.path.exists(path):
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load,
            )

            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = deserialize_and_load(payload, in_tree, out_tree)
            logger.info("aot cache hit: %s", path)
            STATS["hits"].append((name, round(_time.time() - t0, 2)))
            try:
                os.utime(path)  # LRU recency for _prune
            except OSError:
                pass
            return compiled
        except Exception as e:
            logger.warning("aot cache load failed (%s); recompiling", e)
            STATS["load_failures"].append((name, str(e)[:120]))
    compiled = lowered.compile()
    STATS["misses"].append((name, round(_time.time() - t0, 2)))
    try:
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
        os.makedirs(cdir, exist_ok=True)
        # atomic write: the driver may run several processes against one
        # cache directory
        fd, tmp = tempfile.mkstemp(dir=cdir, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        logger.info("aot cache store: %s", path)
        _prune(cdir)
    except Exception as e:  # pragma: no cover - defensive
        logger.warning("aot cache store failed (%s)", e)
    return compiled


def _prune(cdir: str) -> None:
    """Drop the oldest entries once the cache exceeds its size cap.

    Every source edit changes the StableHLO hash, so entries accumulate
    across build rounds; cap the directory (default 6 GB,
    DRACO_TPU_AOT_CACHE_MAX_GB) by least-recently-touched eviction.
    """
    try:
        cap = float(os.environ.get("DRACO_TPU_AOT_CACHE_MAX_GB", "6"))
        entries = []
        total = 0
        for name in os.listdir(cdir):
            if not name.endswith(".aot"):
                continue
            p = os.path.join(cdir, name)
            st = os.stat(p)
            entries.append((st.st_mtime, st.st_size, p))
            total += st.st_size
        if total <= cap * 2**30:
            return
        entries.sort()
        for _, size, p in entries:
            os.remove(p)
            logger.info("aot cache evict: %s", p)
            total -= size
            if total <= cap * 2**30:
                break
    except Exception:  # pragma: no cover - defensive
        pass
