from psulvsb_tpu.certify.drs import DRSCertifier, CertificationResult, certify_rotation
