from .data_reader import DataFile, read_data, write_data
from . import lattice
from . import velocity
from . import dump
