from psulvsb_tpu.core.linalg import (
    hatmap,
    vector_kron,
    nearest_psd,
    svd_rot,
    rot_from_correlation,
)
from psulvsb_tpu.core.se3 import (
    SE3,
    transform_points,
    compose_srt,
    random_se3,
    rodrigues,
)
from psulvsb_tpu.core.metrics import (
    angular_error_rad,
    angular_error_deg,
    translation_error,
    masked_rmse,
    inlier_probability,
    calculate_diameter,
)
