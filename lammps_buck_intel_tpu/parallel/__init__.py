from .slab import SlabCellPairSimulation, slab_mesh, ext_nbr_table
