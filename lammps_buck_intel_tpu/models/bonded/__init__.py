from .harmonic import BondedStyle, BondedResult, make_bonded, compute_bonded
