from doa_mpc_tpu.solver.sqp_rti import (  # noqa: F401
    RtiController,
    RtiState,
    make_rti_controller,
)
