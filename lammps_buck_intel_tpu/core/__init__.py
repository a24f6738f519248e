from .units import Units, get_units, LJ, REAL, METAL
from .precision import Precision, get_precision, single, mixed, double
from .box import Box, make_box, minimum_image, wrap, unwrap, to_lamda, from_lamda
from .state import System, Topology, make_system, build_topology, empty_topology
