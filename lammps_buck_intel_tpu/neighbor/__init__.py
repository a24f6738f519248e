from .neighbor_list import (
    NeighborList,
    NeighborSpec,
    make_spec,
    grow,
    build,
    build_dense,
    build_cell,
    build_with_retry,
    needs_rebuild,
)
from . import cell_slots
