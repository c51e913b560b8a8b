"""Multi-chip execution: device-mesh sharding + collectives.

Replaces the reference stack's (never-exercised) MPI/parmetis path
(environment.yml mpich/parmetis pins; dolfin comm plumbed at
ns_solver_base.py:939) with JAX-native SPMD over a ``jax.sharding.Mesh``.
"""

from navierstokes_tpu.parallel.sharded import (  # noqa: F401
    ShardedCellOperator,
    device_mesh,
)
