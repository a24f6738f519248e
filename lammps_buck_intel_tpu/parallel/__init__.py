from .slab import SlabCellPairSimulation, slab_mesh, ext_nbr_table
from .slab_npt import SlabNPTSimulation
from .pencil2d import Pencil2DSimulation, pencil_mesh
