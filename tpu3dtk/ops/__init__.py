from . import nn, reduction  # noqa: F401
