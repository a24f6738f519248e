from .base import KSpaceResult, BoundKSpace, CombinedKSpace
from .ewald import Ewald, setup_ewald
from .pppm import PPPM, setup_pppm
from .pppm_npt import (
    TracedPPPM, TracedPPPMDisp, TracedBoundKSpace, TracedCombinedKSpace,
    make_traced_kspace,
)
from .pppm_disp import PPPMDisp, setup_pppm_disp, solve_g6
from .pppm_cells import CellPPPM, make_patch_spec
from .pppm_slab import SlabCellPPPM, SlabCellPPPMDisp, SlabCombinedKSpace
