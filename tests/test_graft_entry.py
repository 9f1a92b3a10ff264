"""Driver-contract tests: entry() compiles; dryrun_multichip runs a full
sharded train step on the virtual 8-device CPU mesh."""
import sys

import jax
import pytest

sys.path.insert(0, ".")


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert "boxes" in out
