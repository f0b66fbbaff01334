"""jax version compatibility for shard_map (shared by ring.py/pipeline.py).

jax >= 0.8 moved shard_map out of experimental and renamed the replication
check kwarg check_rep -> check_vma; SM_NOCHECK carries whichever disables it.
"""

import inspect as _inspect

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

SM_NOCHECK = ({"check_vma": False}
              if "check_vma" in _inspect.signature(shard_map).parameters
              else {"check_rep": False})

__all__ = ["shard_map", "SM_NOCHECK"]
