"""Driver-entry regression tests.

Round-1 shipped a dryrun_multichip that failed in the driver's
environment (single real TPU visible) because no test invoked it
verbatim (VERDICT.md "What's missing" #1). These tests call the exact
driver entry points.
"""

import pytest

import jax

import __graft_entry__ as entrymod


@pytest.mark.slow
def test_dryrun_multichip_8():
    # Verbatim driver call. Under the test conftest there are already 8
    # virtual CPU devices, so this runs inline; in a driver-like
    # environment (1 device) it re-execs in a bootstrapped subprocess.
    entrymod.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subprocess_bootstrap(monkeypatch):
    # Force the subprocess path even though 8 devices are available, to
    # cover the driver's actual code path (1 real chip).
    monkeypatch.delenv("MIA_DRYRUN_CHILD", raising=False)
    real_devices = jax.devices

    def one_device():
        return real_devices()[:1]

    monkeypatch.setattr(jax, "devices", one_device)
    entrymod.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles_single_chip():
    fn, (params, batch) = entrymod.entry()
    loss = jax.jit(fn)(params, batch)
    assert bool(jax.numpy.isfinite(loss))
