from lasso_tpu.utils.chunked import chunked_encode
from lasso_tpu.utils.checkpoint import (dict_learning_resumable,
                                        latest_step, restore_checkpoint,
                                        save_checkpoint)
from lasso_tpu.utils.configs import CONFIGS, SolverConfig, config_for
from lasso_tpu.utils.export import export_encoder, load_encoder
from lasso_tpu.utils.profiling import (capture_trace, debug_nans,
                                       time_solver, trace)

__all__ = [
    "save_checkpoint", "restore_checkpoint", "latest_step",
    "dict_learning_resumable", "SolverConfig", "CONFIGS", "config_for",
    "trace", "capture_trace", "time_solver", "debug_nans",
    "export_encoder", "load_encoder", "chunked_encode",
]
