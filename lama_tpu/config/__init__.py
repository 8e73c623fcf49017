from .node import ConfigNode, to_dict, merge
from .compose import compose, load_yaml, parse_overrides, save_config
