from noise_flow_tpu.ops.nn import (  # noqa: F401
    conv2d_nhwc,
    batch_norm_apply,
    batch_norm_init,
    coupling_nn_init,
    coupling_nn_apply,
    coupling_nn_iso_init,
    coupling_nn_iso_apply,
    conv_zeros_init,
    conv_zeros_apply,
)
from noise_flow_tpu.ops.conv1x1 import (  # noqa: F401
    matrix_param_init,
    matrix_param_build,
)
from noise_flow_tpu.ops.squeeze import squeeze2d, unsqueeze2d  # noqa: F401
from noise_flow_tpu.ops.gaussian import (  # noqa: F401
    diag_gaussian_logp,
    diag_gaussian_sample,
)
