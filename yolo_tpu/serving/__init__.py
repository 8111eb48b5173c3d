from yolo_tpu.serving.pipeline import StreamingDetector  # noqa: F401
