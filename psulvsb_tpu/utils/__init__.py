from psulvsb_tpu.utils.precision import mm
from psulvsb_tpu.utils.padding import pad_columns, pad_to_bucket
