from noise_flow_tpu.models.flow import NoiseFlow  # noqa: F401
