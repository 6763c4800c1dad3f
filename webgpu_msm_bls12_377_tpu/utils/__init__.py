"""Shared utilities: device fencing and timing.

The axon TPU relay's block_until_ready can return at enqueue time, so all
timing in this repo fences through a host readback (see PERF.md).
"""

from .timing import fence, time_fn  # noqa: F401
