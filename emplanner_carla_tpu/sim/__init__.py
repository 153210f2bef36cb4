from emplanner_carla_tpu.sim import (  # noqa: F401
    camera,
    closed_loop,
    detector,
    perception,
    plant,
    scenario,
)
