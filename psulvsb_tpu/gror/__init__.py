from psulvsb_tpu.gror.gror import gror_align, GRORResult, GRORInitialAlignment
