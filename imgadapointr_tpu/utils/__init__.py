from .config import AttrDict, cfg_from_yaml_file, get_config
from .registry import DATASETS, MODELS, build_dataset_from_cfg, build_model_from_cfg
