"""End-to-end CLI test of the tutorial workflow and example configs.

Exercises the full user-facing surface the reference tutorial drives
(reference doc/tutorial.rst:78-168): product generation
(drift-makeproducts), sky synthesis (cora-makesky), the simulate pipeline
and the analyze pipeline — all through the ``python -m draco_tpu`` CLI
entry points, on a tiny dish array.
"""

import os
import re

import numpy as np
import pytest

from draco_tpu.core.containers import ContainerBase, Map
from draco_tpu.core.pipeline import main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PRODUCTS_YAML = """
config:
    output_directory: "products/"

telescope:
    type: UnpolarisedDishArray
    grid_ew: 2
    grid_ns: 1
    spacing_ew: 6.0
    spacing_ns: 6.0
    latitude: 45.0
    freq_lower: 400.0
    freq_upper: 410.0
    num_freq: 2
    auto_correlations: Yes
"""


@pytest.mark.slow
def test_tutorial_workflow(tmp_path):
    tdir = str(tmp_path)

    # 1. drift-makeproducts equivalent
    cfg = tmp_path / "products.yaml"
    cfg.write_text(PRODUCTS_YAML)
    assert main(["makeproducts", str(cfg)]) == 0
    assert (tmp_path / "products" / "bt" / "beam_m.npy").exists()

    # 2. cora-makesky equivalent
    skydir = tmp_path / "sky_maps"
    skydir.mkdir()
    assert (
        main(
            ["makesky", "foreground", str(skydir / "fg.h5"), "--nside", "16",
             "--freq-start", "400", "--freq-end", "410", "--nfreq", "2"]
        )
        == 0
    )
    m = Map.from_file(str(skydir / "fg.h5"))
    assert m.map.shape[0] == 2

    # 3-4. the example simulate + analyze pipelines, paths rewritten into
    # the temp dir
    def _localise(name):
        src = open(os.path.join(REPO, "examples", name)).read()
        src = src.replace('"products/bt"', f'"{tdir}/products/bt"')
        src = src.replace('"sky_maps/*.h5"', f'"{tdir}/sky_maps/*.h5"')
        src = src.replace('"sim_"', f'"{tdir}/sim_"')
        src = src.replace('"sim_*.h5"', f'"{tdir}/sim_*.h5"')
        src = src.replace('"ml_map.h5"', f'"{tdir}/ml_map.h5"')
        dst = tmp_path / name
        dst.write_text(src)
        return str(dst)

    assert main(["run", _localise("simulate.yaml")]) == 0
    sims = [f for f in os.listdir(tdir) if re.match(r"sim_.*\.h5", f)]
    assert sims, "simulate pipeline wrote no stream"
    ss = ContainerBase.from_file(os.path.join(tdir, sims[0]))
    assert np.isfinite(np.asarray(ss.vis[:])).all()
    assert np.abs(np.asarray(ss.vis[:])).max() > 0

    assert main(["run", _localise("analyze.yaml")]) == 0
    assert (tmp_path / "ml_map.h5").exists()
    out = ContainerBase.from_file(str(tmp_path / "ml_map.h5"))
    arr = np.asarray(out.map[:])
    assert np.isfinite(arr).all() and np.abs(arr).max() > 0


def test_lint_all_example_and_doc_configs():
    """Every shipped YAML config must pass the linter (reference CI lints
    examples/*.yaml and doc/pipeline_params.yaml the same way)."""
    import glob
    import os

    from draco_tpu.core.pipeline import main

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    configs = sorted(
        glob.glob(os.path.join(repo, "examples", "*.yaml"))
        + glob.glob(os.path.join(repo, "docs", "*.yaml"))
    )
    assert len(configs) >= 6
    assert main(["lint", *configs]) == 0
