from .ramps import LinearRamp, LadderRamp, get_ramp
from .misc import (flatten_dict, add_prefix_to_keys, average_dicts,
                   enable_compilation_cache, handle_deterministic_config,
                   register_debug_signal_handlers)
