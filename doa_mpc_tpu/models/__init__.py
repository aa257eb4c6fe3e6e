from doa_mpc_tpu.models.unicycle import (  # noqa: F401
    dynamics,
    obstacle_h,
    obstacle_h_jac,
    SAFE_DIST_SQ_FIELDS,
)
