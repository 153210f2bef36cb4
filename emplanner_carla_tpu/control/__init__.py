from emplanner_carla_tpu.control import lateral, pid, vehicle  # noqa: F401
