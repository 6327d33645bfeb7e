from psulvsb_tpu.frontend.knn import knn, pairwise_sq_dists
from psulvsb_tpu.frontend.normals import estimate_normals
from psulvsb_tpu.frontend.histogram_filter import normal_angle_histogram_filter
