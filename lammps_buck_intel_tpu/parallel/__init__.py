from .spmd import make_mesh, make_spmd_step, ShardedState, pad_to_multiple
from .slab import SlabCellPairSimulation, slab_mesh, ext_nbr_table
