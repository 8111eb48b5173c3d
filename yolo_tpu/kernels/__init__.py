from yolo_tpu.kernels.int8_conv import (  # noqa: F401
    int8_conv3x3_im2col, int8_conv3x3_pool_requant, int8_conv3x3_requant,
    int8_res_block)
