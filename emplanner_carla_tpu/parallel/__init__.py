from emplanner_carla_tpu.parallel import fleet  # noqa: F401
