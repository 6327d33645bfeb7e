from psulvsb_tpu.pairs.tims import (
    triu_pair_indices,
    compute_tims,
    gather_tims,
    scale_ratio_histogram,
    peak_bin_mask,
)
