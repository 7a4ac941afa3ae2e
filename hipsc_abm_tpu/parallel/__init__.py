"""Multi-chip parallelism.

The deployment path is ``DomainHipscEngine`` (spatial domain decomposition:
O(boundary) ``ppermute`` collectives, per-stripe Pallas kernels, agent
migration). ``parallel.mesh.ShardedHipscEngine`` (GSPMD agent sharding) is a
correctness cross-check with O(colony) collectives and kernels disabled —
deliberately NOT re-exported here so it cannot be picked by accident.
"""

from hipsc_abm_tpu.parallel.domain_engine import (  # noqa: F401
    DomainHipscEngine,
    DomainState,
)

__all__ = ["DomainHipscEngine", "DomainState"]
