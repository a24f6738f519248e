from . import pallas_cellpair
