from .base import KSpaceResult
from .ewald import Ewald, setup_ewald
