"""Cross-cutting utilities: structured tracing/profiling, logging."""

from .trace import Tracer, jax_profile  # noqa: F401
