"""Pallas batched path-DP transition obstacle costs vs the XLA form.

Runs through the Pallas interpreter on CPU; TPU-hardware validation at
batch 4096 is part of the verify drives (bitwise-identical there)."""

import jax
import jax.numpy as jnp
import numpy as np

from emplanner_carla_tpu.config import PathPlanConfig
from emplanner_carla_tpu.ops import path_obs_pallas as pop
from emplanner_carla_tpu.planner import path_dp


def test_batched_pallas_trans_obs_matches_xla():
    cfg = PathPlanConfig()
    B, K = pop.BLK, 8
    rng = np.random.default_rng(0)
    ps = jnp.asarray(rng.uniform(0, 30, (B,)), jnp.float32)
    # obstacles spread across in-window / out-of-window / invalid, plus
    # NaN garbage in some invalid slots (the where-guards must hold)
    obs_s = jnp.asarray(
        ps[:, None] + rng.uniform(-20, 160, (B, K)), jnp.float32
    )
    obs_l = jnp.asarray(rng.uniform(-8, 8, (B, K)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(B, K)) < 0.6)
    obs_s = jnp.where(
        ~valid & (rng.uniform(size=(B, K)) < 0.3), jnp.nan, obs_s
    )

    ref = jax.vmap(
        lambda s, l, v, p: path_dp._transition_obstacle_costs_xla(
            s, l, v, p, cfg
        )
    )(obs_s, obs_l, valid, ps)

    pop.transition_obstacle_costs_batched._interpret = True
    try:
        out = pop.transition_obstacle_costs_batched(
            obs_s, obs_l, valid, ps, cfg
        )
    finally:
        pop.transition_obstacle_costs_batched._interpret = False

    # last-ulp tolerance ON CPU ONLY: the compiled XLA:CPU fold contracts
    # mul+add into FMA while the Pallas interpreter executes op by op
    # (~2% of elements differ by <= 2.2e-7 relative). On the TPU, where
    # both paths ship, kernel vs XLA measured 0 mismatches of 2.9M at
    # batch 4096 (round-5 verify drive) — no FMA contraction divergence.
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-7, atol=1e-3
    )


def test_dispatch_same_under_vmap():
    """The custom_vmap rule's XLA branch (non-TPU backend here) equals the
    plain vmapped base — the dispatch plumbing must be transparent."""
    cfg = PathPlanConfig()
    B, K = 32, 8
    rng = np.random.default_rng(1)
    ps = jnp.asarray(rng.uniform(0, 30, (B,)), jnp.float32)
    obs_s = jnp.asarray(ps[:, None] + rng.uniform(0, 90, (B, K)), jnp.float32)
    obs_l = jnp.asarray(rng.uniform(-8, 8, (B, K)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(B, K)) < 0.6)
    a = jax.vmap(
        lambda s, l, v, p: path_dp.transition_obstacle_costs(s, l, v, p, cfg)
    )(obs_s, obs_l, valid, ps)
    b = jax.vmap(
        lambda s, l, v, p: path_dp._transition_obstacle_costs_xla(
            s, l, v, p, cfg
        )
    )(obs_s, obs_l, valid, ps)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
