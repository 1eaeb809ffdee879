from . import bkd, nn, reduction, search  # noqa: F401
