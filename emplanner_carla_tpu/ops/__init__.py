from emplanner_carla_tpu.ops import (  # noqa: F401
    frenet,
    interp,
    qp,
    qp_pallas,
    quintic,
    speed_dp_pallas,
)
