"""Global seeding (reference set_all_seeds, utils.py:266-279).

JAX randomness is functional (explicit PRNGKeys threaded everywhere), so the
only global state to seed is numpy/python — used by the permutation replay
and host-side data synthesis."""

from __future__ import annotations

import random

import numpy as np


def set_all_seeds(seed: int) -> None:
    np.random.seed(seed)
    random.seed(seed)
