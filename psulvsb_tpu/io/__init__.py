from psulvsb_tpu.io.ply import read_ply, write_ply
