from .base import KSpaceResult
from .ewald import Ewald, setup_ewald
from .pppm import PPPM, setup_pppm
