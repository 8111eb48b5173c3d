from yolo_tpu.data.transforms import (  # noqa: F401
    BaseTransform,
    SSDAugmentation,
    base_transform,
)
from yolo_tpu.data.voc import (  # noqa: F401
    VOC_CLASSES,
    VOC_CLASSES_MASK,
    VOCDetection,
)
from yolo_tpu.data.synthetic import SyntheticDetection  # noqa: F401
from yolo_tpu.data.loader import BatchLoader, detection_collate  # noqa: F401
