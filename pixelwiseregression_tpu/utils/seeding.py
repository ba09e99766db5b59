"""Determinism helpers (reference: utils.py:295-300).

JAX is deterministic by construction given a PRNG key; the pieces that need
seeding are numpy/python RNGs used by the host-side loader shuffle and
dataset split building.
"""

from __future__ import annotations

import random

import numpy as np


def setup_seed(seed: int):
    np.random.seed(seed)
    random.seed(seed)
