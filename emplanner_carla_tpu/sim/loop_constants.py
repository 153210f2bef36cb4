"""Single source for the closed-loop safety/collision constants.

These appear in BOTH tick-loop implementations — the XLA scan bodies in
``sim/closed_loop.py`` and the Pallas whole-tick-loop kernel in
``ops/tick_pallas.py`` — whose equivalence the ``custom_vmap`` dispatch
promises (pinned by tests/test_tick_pallas.py across all four
controller x plant pairs). Keeping them here makes an edit land in both
paths at once instead of silently forking the semantics.

Reference anchors: the arrival brake / collision semantics come from
``/root/reference/test_9.py:40-45,441-446``; the time-headway ACC guard is
this rebuild's longitudinal safety layer (the reference has none — its DP
follows the min-cost *colliding* path when infeasible,
``path_planning.py:351-353``).
"""

COLLISION_RADIUS = 1.5  # metres: ego-to-obstacle distance counted as a hit
ACC_STANDOFF = 7.0      # metres kept to a lead obstacle when stopped
ACC_HEADWAY = 1.4       # seconds of time headway
