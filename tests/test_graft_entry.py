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


def test_subprocess_env_scrubs_axon_vars():
    """MULTICHIP r3 root cause: the dryrun child must never inherit the
    axon/TPU trigger vars, or its sitecustomize warms the TPU backend at
    interpreter startup (before __main__ forces CPU) and any libtpu/tunnel
    drift kills the run at import time."""
    import __graft_entry__ as ge

    env = {
        "PALLAS_AXON_POOL_IPS": "10.255.255.1",  # poisoned: dead relay
        "AXON_WHATEVER": "1",
        "TPU_CHIPS_PER_HOST_BOUNDS": "1,1,1",
        "LIBTPU_INIT_ARGS": "--x",
        "PATH": "/usr/bin",
        "XLA_FLAGS": "--foo",
        "HOME": "/root",
    }
    out = ge._scrub_accelerator_env(env)
    assert set(out) == {"PATH", "XLA_FLAGS", "HOME"}
    assert out["PATH"] == "/usr/bin"


@pytest.mark.slow
def test_dryrun_multichip_survives_poisoned_axon(monkeypatch):
    """End-to-end: with PALLAS_AXON_POOL_IPS pointing at a dead IP (the
    exact failure mode of MULTICHIP_r03), the subprocess path must still
    complete because the child env is scrubbed."""
    import __graft_entry__ as ge

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.255.255.1")
    # force the subprocess path even if this process could host the mesh
    monkeypatch.setenv("XLA_FLAGS", "")
    ge._dryrun_multichip_subprocess(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert "boxes" in out
