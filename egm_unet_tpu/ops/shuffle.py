"""Channel shuffle (parameter-free), NHWC.

ref: src/EGM-UNet.py:739-753 — reshape C -> (groups, C//groups), transpose,
flatten.  In NHWC this is a reshape/transpose on the trailing axis only, so
XLA lowers it to a cheap in-VMEM relayout.
"""

from __future__ import annotations

import jax


def channel_shuffle(x: jax.Array, groups: int = 4) -> jax.Array:
    *lead, c = x.shape
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    x = x.reshape(*lead, groups, c // groups)
    x = x.swapaxes(-1, -2)
    return x.reshape(*lead, c)
