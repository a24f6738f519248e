from .harmonic import BondedStyle, BondedResult, make_bonded, compute_bonded
from .charmm import bake_charmm_14
