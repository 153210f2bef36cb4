from emplanner_carla_tpu.ops import (  # noqa: F401
    frenet,
    qp,
    qp_pallas,
    quintic,
    speed_dp_pallas,
)
