from protopformer_tpu.models.deit import DeiTBackbone, DistilledDeiT
from protopformer_tpu.models.cait import CaiTBackbone
from protopformer_tpu.models.ppnet import (
    PPNet,
    BaseNet,
    EvalOutput,
    TrainOutput,
    construct_ppnet,
)
from protopformer_tpu.models.registry import create_backbone, BACKBONE_REGISTRY
