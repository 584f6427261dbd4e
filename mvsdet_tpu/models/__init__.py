from mvsdet_tpu.models.resnet import ResNet50
from mvsdet_tpu.models.fpn import FPN
from mvsdet_tpu.models.cost_reg import CostRegNet
from mvsdet_tpu.models.neck3d import IndoorImVoxelNeck
