from .styles import (PairStyle, PairConfig, build_buck, build_lj,
                     build_lj_charmm, pair_terms)
from .driver import (PairResult, compute_pair, pair_energy_fn,
                     compute_pair_peratom)
from .cellpair import compute_cellpair, CellPairResult
