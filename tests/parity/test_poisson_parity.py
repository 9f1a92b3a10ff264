"""Poisson blending parity vs the reference implementation
(``BSGAL/bsgal/data/transforms/possion_blending.py:8-64``) on random
source/target/mask triples — both are host-side scipy sparse solves, so the
outputs should agree to solver tolerance."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()


def test_poisson_edit_parity():
    import importlib.util

    # import the file directly: the bsgal package __init__ chain pulls in
    # meta-arch modules with extra missing deps (torchshow)
    spec = importlib.util.spec_from_file_location(
        "ref_possion",
        "/root/reference/BSGAL/bsgal/data/transforms/possion_blending.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref_edit = mod.poisson_edit

    from divergen_tpu.data.poisson_blend import poisson_edit

    rng = np.random.RandomState(0)
    h = w = 24
    src = (rng.rand(h, w, 3) * 255).astype(np.float64)
    dst = (rng.rand(h, w, 3) * 255).astype(np.float64)
    mask = np.zeros((h, w), np.uint8)
    mask[6:18, 8:20] = 1

    want = ref_edit(src.copy(), dst.copy(), mask.copy())
    got = poisson_edit(src.copy(), dst.copy(), mask.copy())
    # The reference solves over the WHOLE image and only pins identity rows
    # for NON-border outside pixels (possion_blending.py:38-46 loops
    # range(1, n-1)), so the 1-pixel image border keeps raw Laplacian
    # equations — an accident of the vendored code that perturbs border
    # pixels far from the mask. Our solve is interior-only (outside pixels
    # untouched), so parity is asserted away from that border band.
    inner = (slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(
        got[inner].astype(np.float64), want[inner].astype(np.float64), atol=1.5
    )
    # outside the mask (and off the border) both leave the target unchanged
    outside = np.ones((h, w), bool)
    outside[6:18, 8:20] = False
    outside[0, :] = outside[-1, :] = False
    outside[:, 0] = outside[:, -1] = False
    np.testing.assert_allclose(got[outside], dst[outside].astype(got.dtype))
