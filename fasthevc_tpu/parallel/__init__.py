"""Distribution layer: ("gop", "tile") device mesh + sharded encode steps.

Reference parity: SURVEY.md §2.4 — the reference (single-process HM-derived
C++) codes tiles/WPP/slices serially; here they are real execution
strategies: GOP-parallel frames over the "gop" mesh axis (P4), CTU tile
columns over the "tile" axis (P1), halo exchange of boundary pixels via
lax.ppermute for ME windows / cross-tile filters (P6), XLA collectives over
ICI/DCN (P8) — no NCCL/MPI analog to manage.
"""

from .mesh import gop_tile_mesh, sharded_search_step

__all__ = ["gop_tile_mesh", "sharded_search_step"]
