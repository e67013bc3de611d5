"""Worker-importability shim.

Ray workers are separate processes that must deserialize our stage
classes/functions. When the driver's CWD is not the repo root and the
package is not installed, by-reference pickling fails with
``ModuleNotFoundError: No module named 'engine'``. Two defenses:

1. at package import we append the repo root to ``PYTHONPATH`` so any
   raylet started AFTER the import spawns workers that can import us;
2. ``ensure_serializable()`` registers every loaded ``engine.*`` module
   for by-value cloudpickle serialization, which makes stages
   self-contained regardless of worker environment (the right behavior
   for ``ray job submit`` to a real cluster as well). Module code is a
   few tens of KB — shipped once per actor/task definition, not per
   batch.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_pp = os.environ.get("PYTHONPATH", "")
if _REPO_ROOT not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        f"{_pp}{os.pathsep}{_REPO_ROOT}" if _pp else _REPO_ROOT
    )

_registered = False


def pool_size(reserve: int = 1, floor: int = 1) -> tuple:
    """Autoscaling actor-pool bounds sized to the CLUSTER, not a constant.

    A hard-coded ``concurrency=(1, 4)`` caps a 256-node cluster at 4
    actors; this returns ``(floor, cluster_CPUs - reserve)`` so pools
    scale with wherever the job lands while leaving slots for
    read/shuffle tasks. ``floor`` stays 1: a plan with several actor-pool
    stages on a small cluster must not RESERVE all CPUs for actors up
    front or the read tasks starve and the pipeline deadlocks. Falls back
    to 8 when Ray is not yet initialized (plan built before init — the
    driver contract initializes first)."""
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8) or 8)
    except Exception:  # pragma: no cover - init race only
        ncpu = 8
    return (floor, max(floor + 1, ncpu - reserve))


def ensure_serializable() -> None:
    """Register all loaded engine.* modules for by-value pickling."""
    global _registered
    if _registered:
        return
    try:
        import ray.cloudpickle as cloudpickle
    except ImportError:  # pragma: no cover
        import cloudpickle  # type: ignore
    for name, mod in list(sys.modules.items()):
        if mod is None or not (name == "engine" or name.startswith("engine.")):
            continue
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:
            pass
    _registered = True
