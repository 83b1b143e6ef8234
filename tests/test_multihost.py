"""Multi-host scaffolding: split_local, sharded I/O, 2-process smoke test.

The two-process test is the CPU analogue of the reference's
``mpirun -np 4`` CI gate: two actual OS processes join a JAX distributed
coordinator, each sees both processes' devices, runs a collective, and
writes its own HDF5 shard which either side can reassemble.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from draco_tpu.core import containers
from draco_tpu.parallel import multihost


def test_split_local_balanced():
    # 10 over 4 processes: 3, 3, 2, 2 with correct offsets
    got = [multihost.split_local(10, r, 4) for r in range(4)]
    assert got == [(3, 0), (3, 3), (2, 6), (2, 8)]
    assert sum(c for c, _ in got) == 10


def test_initialize_noop_without_config(monkeypatch):
    for var in (
        "DRACO_TPU_COORDINATOR",
        "DRACO_TPU_NUM_PROCESSES",
        "DRACO_TPU_PROCESS_ID",
    ):
        monkeypatch.delenv(var, raising=False)
    assert multihost.initialize() is False


def _make_stream(nfreq=4, nbase=3, nra=8):
    ss = containers.SiderealStream(
        freq=np.linspace(400.0, 500.0, nfreq),
        ra=nra,
        input=3,
        stack=nbase,
        prod=nbase,
    )
    rng = np.random.Generator(np.random.SFC64(5))
    ss.vis[:] = (
        rng.standard_normal(ss.vis.shape) + 1j * rng.standard_normal(ss.vis.shape)
    ).astype(ss.vis.dtype)
    ss.weight[:] = rng.random(ss.weight.shape).astype(ss.weight.dtype)
    return ss


def test_sharded_io_roundtrip(tmp_path):
    ss = _make_stream()
    path = str(tmp_path / "stream.h5")
    # simulate two writers in one process
    multihost.save_sharded(ss, path, rank=0, size=2)
    multihost.save_sharded(ss, path, rank=1, size=2)

    back = multihost.load_sharded(path)
    assert type(back).__name__ == "SiderealStream"
    assert np.allclose(np.asarray(back.vis[:]), np.asarray(ss.vis[:]))
    assert np.allclose(np.asarray(back.weight[:]), np.asarray(ss.weight[:]))


def test_sharded_io_detects_missing_part(tmp_path):
    ss = _make_stream()
    path = str(tmp_path / "stream.h5")
    multihost.save_sharded(ss, path, rank=0, size=2)
    with pytest.raises(FileNotFoundError):
        multihost.load_sharded(path)


_WORKER = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")

    from draco_tpu.parallel import multihost

    ok = multihost.initialize()
    assert ok, "distributed init did not engage"
    rank = jax.process_index()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 2  # one CPU device per process, global view

    # collective: global psum across both processes' devices
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("p",))
    arr = jax.make_array_from_callback(
        (2,),
        NamedSharding(mesh, P("p")),
        lambda idx: np.array([float(rank + 1)]),
    )
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
    )(arr)
    assert float(np.asarray(total)) == 3.0, np.asarray(total)

    # per-process sharded write of a container slab
    sys.path.insert(0, os.environ["DRACO_TPU_TEST_DIR"])
    from test_multihost import _make_stream

    ss = _make_stream()
    multihost.save_sharded(ss, os.environ["DRACO_TPU_TEST_FILE"])
    print(f"WORKER{rank} OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_smoke(tmp_path):
    """Two real processes: distributed init, psum, sharded write/read."""
    port = 20000 + (os.getpid() % 10000)
    out_file = str(tmp_path / "dist_stream.h5")
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            DRACO_TPU_COORDINATOR=f"localhost:{port}",
            DRACO_TPU_NUM_PROCESSES="2",
            DRACO_TPU_PROCESS_ID=str(rank),
            DRACO_TPU_TEST_DIR=os.path.dirname(os.path.abspath(__file__)),
            DRACO_TPU_TEST_FILE=out_file,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"WORKER{rank} OK" in out

    back = multihost.load_sharded(out_file)
    want = _make_stream()
    assert np.allclose(np.asarray(back.vis[:]), np.asarray(want.vis[:]))


_PIPE_CFG = """
pipeline:
  tasks:
    - type: draco_tpu.util.testing.RandomFreqData
      out: data
      params:
        num_realisation: 1
        num_ra: 16
        num_base: 6
        num_freq: 32
        seed: 424242
    - type: draco_tpu.analysis.transform.FrequencyRebin
      in: data
      params:
        channel_bin: 4
        save: true
        output_name: "{out_file}"
"""

_PIPE_WORKER = textwrap.dedent(
    """
    import os
    import jax

    jax.config.update("jax_platforms", "cpu")

    from draco_tpu.parallel import multihost

    assert multihost.initialize(), "distributed init did not engage"
    rank = jax.process_index()
    assert multihost.is_leader() == (rank == 0)

    from draco_tpu.core.pipeline import Manager

    Manager.from_yaml_str(os.environ["DRACO_TPU_TEST_CFG"]).run()
    print(f"PIPE{rank} OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_pipeline_matches_single(tmp_path):
    """A YAML pipeline under 2 real processes equals the 1-process run.

    The product-level analogue of the reference's ``mpirun -np 4
    pytest`` CI gate (reference .github/workflows/main.yaml:84-87):
    every process executes every task, only the leader writes, and the
    written product is identical to an unsharded run.
    """
    port = 21000 + (os.getpid() % 10000)
    out_multi = str(tmp_path / "multi.h5")
    out_single = str(tmp_path / "single.h5")

    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            DRACO_TPU_COORDINATOR=f"localhost:{port}",
            DRACO_TPU_NUM_PROCESSES="2",
            DRACO_TPU_PROCESS_ID=str(rank),
            DRACO_TPU_TEST_CFG=_PIPE_CFG.format(out_file=out_multi),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _PIPE_WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"PIPE{rank} OK" in out

    from draco_tpu.core.pipeline import Manager

    Manager.from_yaml_str(_PIPE_CFG.format(out_file=out_single)).run()

    a = containers.ContainerBase.from_file(out_multi, distributed=False)
    b = containers.ContainerBase.from_file(out_single, distributed=False)
    assert type(a).__name__ == type(b).__name__
    for name in b.datasets:
        np.testing.assert_array_equal(
            np.asarray(a.datasets[name][:]), np.asarray(b.datasets[name][:])
        )
