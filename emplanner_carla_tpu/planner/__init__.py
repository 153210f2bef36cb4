from emplanner_carla_tpu.planner import (  # noqa: F401
    path_dp,
    path_qp,
    reference_line,
)
