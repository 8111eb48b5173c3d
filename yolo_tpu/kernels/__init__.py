from yolo_tpu.kernels.int8_conv import int8_conv3x3_requant  # noqa: F401
