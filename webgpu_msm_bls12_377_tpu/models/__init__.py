"""MSM engines: the production cuZK pipeline, the classic Pippenger
bucket method, and the naive baseline."""

from .cuzk import CuzkMsmEngine, choose_chunk_size  # noqa: F401
from .naive import NaiveMsmEngine  # noqa: F401
from .pippenger import PippengerMsmEngine  # noqa: F401
