from psulvsb_tpu.clique.kcore import (
    core_numbers,
    max_kcore_mask,
    greedy_clique,
    max_clique_mask,
)
