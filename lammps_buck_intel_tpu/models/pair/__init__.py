from .styles import PairStyle, PairConfig, build_buck, build_lj, pair_terms
from .driver import PairResult, compute_pair, pair_energy_fn
from .cellpair import compute_cellpair, CellPairResult
