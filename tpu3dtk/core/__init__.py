from . import math3d  # noqa: F401
from .scan import TPUScan  # noqa: F401
