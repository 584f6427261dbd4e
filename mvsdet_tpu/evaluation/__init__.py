from mvsdet_tpu.evaluation.indoor_eval import indoor_map
from mvsdet_tpu.evaluation.nvs_metrics import psnr, ssim
