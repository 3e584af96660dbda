from . import flags
from .experiment_tools import (
    init_checkpoint,
    json_load,
    json_store,
    load,
    parse_flags,
    print_flags,
    print_num_params,
)
