"""Checkpoint / resume of fleet simulation state.

The reference has no persistence at all (SURVEY.md §5: "Checkpoint /
resume: None anywhere"). Fleet-scale rollouts make it necessary: this
module saves/restores the closed-loop carry (plant + controller + planner
state + obstacle world) and accumulated metrics with Orbax, so a long
rollout can resume mid-run and results survive preemption.
"""

from __future__ import annotations

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save(path: str, carry, metrics=None) -> None:
    """Write a checkpoint directory at ``path`` (absolute)."""
    ckpt = _checkpointer()
    payload = {"carry": carry}
    if metrics is not None:
        payload["metrics"] = metrics
    ckpt.save(path, payload)
    ckpt.wait_until_finished()


def restore(path: str, carry_like, metrics_like=None):
    """Restore a checkpoint against matching pytree structures
    (``carry_like``/``metrics_like`` supply shapes and dtypes — the usual
    Orbax restore-by-template contract)."""
    ckpt = _checkpointer()
    template = {"carry": carry_like}
    if metrics_like is not None:
        template["metrics"] = metrics_like
    out = ckpt.restore(path, template)
    if metrics_like is not None:
        return out["carry"], out["metrics"]
    return out["carry"]


def resume_simulation(global_path, carry, cfg, n_plans: int,
                      full: bool = False, behavior: str | None = None):
    """Continue a closed-loop run from a restored carry for ``n_plans`` more
    cycles. Pure functions make resume exact up to the carried controller
    state (the controller rebinds at every cycle boundary anyway,
    ``test_9.py:415-417`` semantics), so re-entering with the restored
    ego/obstacle world continues the rollout.

    A restored ``closed_loop.TrafficCarry`` (pass ``behavior``) resumes
    the agent-traffic loop with the NPCs' carried match indices and
    lane-change state — a mid-lane-change NPC continues its maneuver."""
    import dataclasses

    from emplanner_carla_tpu.sim import closed_loop

    cfg2 = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, n_plans=n_plans)
    )
    if isinstance(carry, closed_loop.TrafficCarry):
        return closed_loop.simulate_traffic(
            global_path, carry.loop.ego, carry.loop.obstacles, cfg2,
            behavior=behavior or "normal", full=full,
            npc_init=(carry.npc_path_index, carry.npc_lane),
        )
    sim = closed_loop.simulate_full if full else closed_loop.simulate
    return sim(global_path, carry.ego, carry.obstacles, cfg2)
