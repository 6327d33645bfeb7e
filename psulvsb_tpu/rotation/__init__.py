from psulvsb_tpu.rotation.gnc import gnc_tls_rotation
from psulvsb_tpu.rotation.fgr import fgr_rotation
