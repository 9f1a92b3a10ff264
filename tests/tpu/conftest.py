"""TPU-only kernel parity suite.

Run on a real chip with:
    DIVERGEN_TEST_TPU=1 python -m pytest tests/tpu -q

The parent conftest leaves the axon/TPU platform alone when
DIVERGEN_TEST_TPU is set; without it (or without TPU hardware) every test
here is skipped, so the suite is safe to collect anywhere.
"""
import os

import pytest


_HERE = os.path.dirname(os.path.abspath(__file__))


def pytest_collection_modifyitems(config, items):
    # NB: this hook sees the WHOLE session's items, not just this dir's —
    # filter by path or the skip leaks onto the entire suite.
    local = [i for i in items if str(i.fspath).startswith(_HERE)]
    if not local:
        return
    if not os.environ.get("DIVERGEN_TEST_TPU"):
        skip = pytest.mark.skip(reason="set DIVERGEN_TEST_TPU=1 on a TPU host")
        for item in local:
            item.add_marker(skip)
        return
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        skip = pytest.mark.skip(reason=f"no TPU backend ({jax.default_backend()})")
        for item in local:
            item.add_marker(skip)
