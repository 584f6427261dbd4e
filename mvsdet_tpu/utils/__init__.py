from mvsdet_tpu.utils.precision import feinsum, fmatmul
