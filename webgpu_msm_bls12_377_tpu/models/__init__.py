"""MSM engines: the production cuZK pipeline and the naive baseline."""

from .cuzk import CuzkMsmEngine, choose_chunk_size  # noqa: F401
from .naive import NaiveMsmEngine  # noqa: F401
