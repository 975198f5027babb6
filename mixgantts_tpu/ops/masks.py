"""Mask utilities.

One polarity everywhere: **True = valid** (the reference flips polarity four
times across `utils/tools.py:144-153`, `model/mixgantts.py:122,137`,
`model/diffusion.py:190` and `model/loss.py:126`; we don't).
"""

import jax.numpy as jnp


def sequence_mask(lengths, max_len):
    """[B] lengths -> [B, max_len] bool mask, True = valid position.

    `max_len` must be a static int (static shapes under jit); `lengths` may be
    traced.
    """
    ids = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return ids < lengths[:, None].astype(jnp.int32)
