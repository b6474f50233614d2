"""cfd_with_cuda_tpu — a TPU-native incompressible-flow FEM framework.

A ground-up JAX/XLA/Pallas rebuild of the capability set of the
``mmgocmen/cfd-with-cuda`` reference suite (3D unsteady incompressible
Navier-Stokes on hexahedral meshes, plus its lineage of Poisson / Stokes /
monolithic-GLS / segregated solvers), re-designed TPU-first:

* mesh topology, sparsity patterns and scatter maps are built once on the
  host (numpy / native C++), then frozen to device arrays;
* elemental assembly is batched ``einsum`` + ``segment_sum`` (no mesh
  coloring needed — XLA scatter-add is deterministic);
* sparse operators live in HBM in padded ELL layout; SpMV / Krylov loops
  are fully jit-compiled ``lax.while_loop`` s with zero host round-trips
  per time step;
* multi-chip scaling shards elements over a ``jax.sharding.Mesh`` with
  ``psum`` halo reduction over ICI.

Reference layer map and parity checklist: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from cfd_with_cuda_tpu.utils.config import SolverConfig, DTypePolicy  # noqa: F401
