from . import icp, minimizers, sequence  # noqa: F401
from .icp import IcpParams, icp_pair, icp_step  # noqa: F401
from .sequence import SequenceRegistration, register_sequence  # noqa: F401
