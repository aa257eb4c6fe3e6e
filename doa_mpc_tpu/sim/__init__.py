from doa_mpc_tpu.sim.obstacles import (  # noqa: F401
    ObstacleState,
    generate_obstacles,
    obstacle_step,
    predict_trajectory,
)
