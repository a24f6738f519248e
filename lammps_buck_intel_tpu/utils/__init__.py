from . import checkpoint
from . import profiler
