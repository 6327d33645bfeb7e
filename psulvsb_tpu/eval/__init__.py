from psulvsb_tpu.eval.synthetic import (
    synthetic_cloud,
    make_synthetic_pair,
    SyntheticPair,
)
