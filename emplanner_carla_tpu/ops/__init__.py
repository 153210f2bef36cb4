from emplanner_carla_tpu.ops import frenet, qp, quintic  # noqa: F401
