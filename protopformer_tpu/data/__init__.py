from protopformer_tpu.data.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize_images,
    unnormalize_images,
)
from protopformer_tpu.data.datasets import (
    DatasetIndex,
    build_dataset_index,
    NUM_CLASSES,
)
from protopformer_tpu.data.transforms import (
    build_eval_transform,
    build_train_transform,
    build_view_transform,
)
from protopformer_tpu.data.loader import HostDataLoader
from protopformer_tpu.data.mixup import MixupCutmix
