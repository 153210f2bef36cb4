"""Tracing / profiling helpers.

The reference's tracing is commented-out ``time.time()`` deltas around
planner stages (``test_9.py:97-221``, ``path_planning.py:207,215``) and HUD
FPS counters (SURVEY.md §5). Here:

* ``trace(...)`` — a context manager around ``jax.profiler`` producing
  TensorBoard-compatible device traces of the compiled loop;
* ``stage_timer`` — wall-clock timing with *forced device synchronization*
  via a scalar transfer. On the axon TPU backend,
  ``jax.block_until_ready`` alone was observed not to fence the remote
  computation (timings of microseconds for second-scale programs); pulling
  one scalar to the host does.
* ``annotate`` — ``jax.named_scope`` wrapper so planner stages are visible
  in profiles.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/emplanner_trace"):
    """Capture a device trace viewable with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> float:
    """Force full materialization of a pytree; returns a checksum scalar.

    The reliable synchronization protocol for remote TPU backends: reduce
    to one scalar on device and fetch it.
    """
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    acc = jnp.float32(0.0)
    for leaf in leaves:
        acc = acc + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
    return float(acc)


@contextlib.contextmanager
def stage_timer(name: str, results: dict | None = None):
    """Wall-clock a stage; caller must ``sync()`` its outputs inside."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = dt


def annotate(name: str):
    """Name a region for profiler traces (``jax.named_scope``)."""
    return jax.named_scope(name)
