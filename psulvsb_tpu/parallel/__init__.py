from psulvsb_tpu.parallel.pairs import (
    make_pair_mesh,
    register_batch,
    register_batch_sharded,
)
