"""Driver-entry tests (VERDICT r1 weak #1): dryrun_multichip must be
GREEN from a process whose JAX backend is ALREADY initialized — it
spawns a fresh CPU subprocess, so the parent's backend is irrelevant."""

import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_from_initialized_parent():
    jax.devices()  # lock in the parent's backend before the call
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises RuntimeError on child failure
