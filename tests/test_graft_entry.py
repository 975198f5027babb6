import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import jax
    fn, args = graft.entry()
    mel, mel_lens = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(mel)).all()
