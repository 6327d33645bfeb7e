from psulvsb_tpu.robust.scalar_tls import (
    tls_vote,
    max_stabbing,
    scale_consensus_1pt,
)
from psulvsb_tpu.robust.scale import (
    solve_scale_tls,
    select_scale_inliers,
    tim_norms,
)
from psulvsb_tpu.robust.translation import solve_translation
