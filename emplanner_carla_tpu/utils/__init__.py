from emplanner_carla_tpu.utils import checkpoint, profiling, report  # noqa: F401
