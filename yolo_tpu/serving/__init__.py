from yolo_tpu.serving.export import (export_detect, load_artifact,  # noqa: F401
                                     save_artifact)
from yolo_tpu.serving.pipeline import StreamingDetector  # noqa: F401
