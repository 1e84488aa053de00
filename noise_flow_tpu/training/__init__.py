from noise_flow_tpu.training.trainer import Trainer, make_optimizer  # noqa: F401
