"""Driver contract: entry() compiles; dryrun_multichip runs on the 8-device
CPU mesh (the same path the driver validates)."""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge  # noqa: E402


def test_entry_lowers_and_compiles():
    fn, args = ge.entry()
    jax.jit(fn).lower(*args)  # trace + lower; full 256px compile is bench-time


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ge.dryrun_multichip(8)
