from doa_mpc_tpu.ops.integrators import rk4_step, irk_step, make_integrator  # noqa: F401
