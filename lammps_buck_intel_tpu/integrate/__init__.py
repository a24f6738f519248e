from .nve import NVEParams, make_nve, initial_integrate, final_integrate
from .verlet import Simulation, MDState, NeighborPolicy, Forces
from .cellpair_verlet import CellPairSimulation
from .nvt import NVTConfig
from .shake import ShakeConstraints, make_shake, make_rigid_from_molecules
from .rigid import RigidBodies, BodyState, make_rigid_bodies
from .npt import NPTConfig, NPTSimulation
from .minimize import fire_minimize
