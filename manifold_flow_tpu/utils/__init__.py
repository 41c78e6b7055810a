"""Host utilities: reference-format artifact IO (utils.io) and
tracing/profiling spans + jax.profiler helpers (utils.profiling)."""

from manifold_flow_tpu.utils import io, profiling

__all__ = ["io", "profiling"]
