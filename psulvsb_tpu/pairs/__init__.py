from psulvsb_tpu.pairs.tims import (
    triu_pair_indices,
    compute_tims,
    gather_tims,
    scale_ratio_histogram,
    peak_bin_mask,
    ratio_bin_indices,
    sort_peak_bin,
    masked_random_compact,
)
