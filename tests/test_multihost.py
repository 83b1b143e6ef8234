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


_SHARDED_CFG = """
pipeline:
{mesh}
  tasks:
    - type: draco_tpu.util.testing.RandomFreqData
      out: data
      params:
        num_realisation: 1
        num_ra: 16
        num_base: 6
        num_freq: 32
        seed: 97531
    - type: draco_tpu.analysis.transform.FrequencyRebin
      in: data
      params:
        channel_bin: 4
        save: true
        save_sharded: {sharded}
        output_name: "{out_file}"
"""


@pytest.mark.slow
def test_two_process_data_sharded_pipeline(tmp_path):
    """Containers as GLOBAL jax.Arrays spanning two real processes.

    The round-3 data-sharded execution model (VERDICT r2 item 2): under
    ``pipeline.mesh {freq: 2}`` every routed container is sharded over a
    mesh whose two devices live in DIFFERENT processes — each process
    holds half the freq axis on its device — the compute runs SPMD
    through FrequencyRebin, and ``save_sharded`` writes one part file
    per process containing ONLY that process's slab.  The reassembled
    product must equal a single-process (8-virtual-device mesh) run.
    Mirrors the reference's per-rank MPIArray slabs (reference
    draco/synthesis/stream.py:91-140).
    """
    port = 22000 + (os.getpid() % 10000)
    out_multi = str(tmp_path / "sharded.h5")
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
            DRACO_TPU_TEST_CFG=_SHARDED_CFG.format(
                out_file=out_multi,
                sharded="true",
                mesh="  mesh:\n    axes: {freq: 2}",
            ),
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

    # each part holds only that process's slab of the freq axis
    import glob as _glob

    import h5py

    parts = sorted(_glob.glob(str(tmp_path / "sharded.part*.h5")))
    assert len(parts) == 2
    with h5py.File(parts[0], "r") as f:
        assert f["vis"].shape[0] == 4  # 32 freqs / bin 4 / 2 processes

    from draco_tpu.core.pipeline import Manager

    Manager.from_yaml_str(
        _SHARDED_CFG.format(out_file=out_single, sharded="false", mesh="")
    ).run()

    a = multihost.load_sharded(out_multi)
    b = containers.ContainerBase.from_file(out_single, distributed=False)
    assert type(a).__name__ == type(b).__name__
    for name in b.datasets:
        np.testing.assert_allclose(
            np.asarray(a.datasets[name][:]),
            np.asarray(b.datasets[name][:]),
            rtol=1e-6,
            atol=1e-6,
        )


_SPINE_WORKER = textwrap.dedent(
    """
    import os
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")

    from draco_tpu.parallel import multihost

    assert multihost.initialize(), "distributed init did not engage"
    rank = jax.process_index()

    from draco_tpu.core import containers
    from draco_tpu.parallel import make_mesh, use_mesh
    from draco_tpu.synthesis.stream import SimulateSidereal
    from draco_tpu.analysis.transform import MModeTransform
    from draco_tpu.analysis.mapmaker import DirtyMapMaker
    from draco_tpu.telescope import BeamTransfer, UnpolarisedDishArray

    tel = UnpolarisedDishArray(
        grid_ew=2, grid_ns=2, spacing_ew=5.0, spacing_ns=5.0, latitude=40.0,
        freq_lower=400.0, freq_upper=440.0, num_freq=8,
        dish_width=5.0, auto_correlations=True, force_lmax=23, force_mmax=23,
    )
    bt = BeamTransfer(telescope=tel).generate()
    rng = np.random.Generator(np.random.SFC64(3))
    m = containers.Map(
        nside=bt.beam_nside, polarisation=False, freq=tel.frequencies
    )
    m.map[:] = rng.standard_normal(m.map.shape).astype(np.float64)

    with use_mesh(make_mesh(axis_name="freq")):
        m.redistribute("freq")
        sim = SimulateSidereal(); sim.read_config({}); sim.setup(bt)
        ss = sim.process(m)
        ss.redistribute("freq")
        mt = MModeTransform(); mt.read_config({}); mt.setup()
        ma = mt.process(ss)
        mm = DirtyMapMaker(); mm.read_config({"nside": bt.beam_nside})
        mm.setup(bt)
        out = mm.process(ma)
        out.redistribute("freq")
        multihost.save_sharded(out, os.environ["DRACO_TPU_TEST_FILE"])
    print(f"SPINE{rank} OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_sim_to_map_spine(tmp_path):
    """The sim->map spine with process-spanning containers (2 procs).

    SimulateSidereal -> MModeTransform -> DirtyMapMaker with every
    container freq-sharded over a mesh whose devices live in different
    processes; the per-process shard saves reassemble to the
    single-process result (VERDICT r2 item 2, sim->map leg).
    """
    port = 23000 + (os.getpid() % 10000)
    out_multi = str(tmp_path / "spine_map.h5")

    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            DRACO_TPU_COORDINATOR=f"localhost:{port}",
            DRACO_TPU_NUM_PROCESSES="2",
            DRACO_TPU_PROCESS_ID=str(rank),
            DRACO_TPU_TEST_FILE=out_multi,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _SPINE_WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"SPINE{rank} OK" in out

    # single-process reference (no mesh)
    from draco_tpu.analysis.mapmaker import DirtyMapMaker
    from draco_tpu.analysis.transform import MModeTransform
    from draco_tpu.synthesis.stream import SimulateSidereal
    from draco_tpu.telescope import BeamTransfer, UnpolarisedDishArray

    tel = UnpolarisedDishArray(
        grid_ew=2, grid_ns=2, spacing_ew=5.0, spacing_ns=5.0, latitude=40.0,
        freq_lower=400.0, freq_upper=440.0, num_freq=8,
        dish_width=5.0, auto_correlations=True, force_lmax=23, force_mmax=23,
    )
    bt = BeamTransfer(telescope=tel).generate()
    rng = np.random.Generator(np.random.SFC64(3))
    m = containers.Map(
        nside=bt.beam_nside, polarisation=False, freq=tel.frequencies
    )
    m.map[:] = rng.standard_normal(m.map.shape).astype(np.float64)
    sim = SimulateSidereal(); sim.read_config({}); sim.setup(bt)
    ss = sim.process(m)
    mt = MModeTransform(); mt.read_config({}); mt.setup()
    ma = mt.process(ss)
    mm = DirtyMapMaker(); mm.read_config({"nside": bt.beam_nside})
    mm.setup(bt)
    ref = mm.process(ma)

    back = multihost.load_sharded(out_multi)
    np.testing.assert_allclose(
        np.asarray(back.map[:]), np.asarray(ref.map[:]), rtol=2e-5, atol=1e-6
    )
