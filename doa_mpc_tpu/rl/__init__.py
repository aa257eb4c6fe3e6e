from doa_mpc_tpu.rl.ddpg import DDPG, DDPGConfig  # noqa: F401
from doa_mpc_tpu.rl.env import SubgoalEnv  # noqa: F401
