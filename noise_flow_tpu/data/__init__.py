from noise_flow_tpu.data.sidd import (  # noqa: F401
    pack_raw,
    unpack_raw,
    load_image_tuple,
    sidd_filename_tuples,
    TRAIN_INSTANCE_IDS,
    TEST_INSTANCE_IDS,
)
