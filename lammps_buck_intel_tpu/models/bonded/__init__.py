from .harmonic import (BondedStyle, BondedResult, make_bonded,
                       compute_bonded, compute_bonded_peratom)
from .charmm import bake_charmm_14
