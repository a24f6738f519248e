from .nve import NVEParams, make_nve, initial_integrate, final_integrate
from .verlet import Simulation, MDState, NeighborPolicy, Forces
from .cellpair_verlet import CellPairSimulation
