from emplanner_carla_tpu.routing import astar, graph  # noqa: F401
