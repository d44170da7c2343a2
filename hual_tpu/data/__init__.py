from hual_tpu.data.datasets import gen_or_load_dataset, gen_train_data_cache_path
from hual_tpu.data.features import load_video_features, visual_feature_sampling
from hual_tpu.data.loader import TrainLoader, EvalLoader

__all__ = [
    "gen_or_load_dataset",
    "gen_train_data_cache_path",
    "load_video_features",
    "visual_feature_sampling",
    "TrainLoader",
    "EvalLoader",
]
