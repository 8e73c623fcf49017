from .ramps import LinearRamp, LadderRamp, get_ramp
from .misc import flatten_dict, add_prefix_to_keys, average_dicts, handle_deterministic_config, register_debug_signal_handlers
