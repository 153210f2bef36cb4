"""Pallas batched speed DP vs the vmapped XLA DP.

Runs through the Pallas interpreter on CPU (BLK forces batch >= 128, so
this is slow-ish but bounded); TPU-hardware validation at batch 4096 is
part of the verify drives (bitwise-identical there).
"""

import jax
import jax.numpy as jnp
import numpy as np

from emplanner_carla_tpu.config import SpeedPlanConfig
from emplanner_carla_tpu.ops import speed_dp_pallas as sdp
from emplanner_carla_tpu.planner import speed_planner
from emplanner_carla_tpu.types import STSegments


def test_batched_pallas_dp_matches_xla():
    cfg = SpeedPlanConfig()
    B, K = sdp.BLK, 4
    rng = np.random.default_rng(0)
    s_in = jnp.asarray(rng.uniform(5, 40, (B, K)), jnp.float32)
    seg = STSegments(
        s_in,
        s_in + jnp.asarray(rng.uniform(1, 10, (B, K)), jnp.float32),
        jnp.asarray(rng.uniform(0, 4, (B, K)), jnp.float32),
        jnp.asarray(rng.uniform(0.5, 7, (B, K)), jnp.float32),
        jnp.asarray(rng.uniform(size=(B, K)) < 0.5),
    )
    seg = seg._replace(t_out=seg.t_in + jnp.abs(seg.t_out - seg.t_in) + 0.3)
    v0 = jnp.asarray(rng.uniform(3, 14, (B,)), jnp.float32)

    ref = jax.vmap(lambda s, v: speed_planner.speed_dp(s, v, cfg))(seg, v0)

    sdp.speed_dp_recursion._interpret = True
    try:
        out = sdp.speed_dp_batched(seg, v0, cfg)
    finally:
        sdp.speed_dp_recursion._interpret = False

    np.testing.assert_array_equal(
        np.asarray(out.end_index), np.asarray(ref.end_index)
    )
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s), atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(out.valid), np.asarray(ref.valid)
    )
