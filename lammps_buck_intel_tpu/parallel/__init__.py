from .slab import SlabCellPairSimulation, slab_mesh, ext_nbr_table
from .slab_npt import SlabNPTSimulation
