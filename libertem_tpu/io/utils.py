"""Partition sizing + file-ownership helpers
(reference: libertem/io/utils.py — get_partition_shape:19,
get_owner_name:7).
"""
from __future__ import annotations

from math import prod
from typing import Tuple

from ..common.shape import Shape


def get_partition_shape(
    dataset_shape: Shape,
    target_size_items: int,
    min_num: int,
    num_cores: int,
) -> Tuple[int, ...]:
    """Nav-shaped partition extent hitting ``target_size_items``
    pixels per partition, honoring a minimum partition count and the
    core count (reference io/utils.py:19 — same rounding contract,
    pinned by tests/io/test_io_utils.py).  Fills nav dims from the
    FASTEST axis outward, truncating the first axis that overshoots.

    This engine's own planner is byte-budget-based
    (DataSet.get_num_partitions); this helper serves API consumers
    that size partitions in items.
    """
    sig_size = dataset_shape.sig.size
    num_cores = max(1, num_cores)
    num_items = dataset_shape.size / target_size_items
    per_core = num_items // num_cores + min(1, num_items % num_cores)
    num = max(1, min_num, num_cores * per_core)
    target = int(dataset_shape.size // num)

    shape: Tuple[int, ...] = ()
    for dim in reversed(tuple(dataset_shape.nav)):
        proposed = (dim,) + shape
        if prod(proposed) * sig_size <= target:
            shape = proposed
        else:
            overshoot = prod(proposed) * sig_size / target
            shape = (max(1, int(dim // overshoot)),) + shape
            break
    pad = len(tuple(dataset_shape.nav)) - len(shape)
    return (1,) * pad + shape


def get_owner_name(full_path, stat) -> str:
    """Owner user name of a stat'ed path (uid fallback where the
    passwd entry is gone; reference io/utils.py:7 — Windows variant
    not applicable on this target)."""
    try:
        import pwd
        return pwd.getpwuid(stat.st_uid).pw_name
    except (ImportError, KeyError):
        return str(stat.st_uid)
