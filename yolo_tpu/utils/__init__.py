from yolo_tpu.utils.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
