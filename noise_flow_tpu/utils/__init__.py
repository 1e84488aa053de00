from noise_flow_tpu.utils.logger import ResultLogger, add_trace_level  # noqa: F401
from noise_flow_tpu.utils.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
