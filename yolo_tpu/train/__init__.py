from yolo_tpu.train.targets import gt_creator, multi_gt_creator  # noqa: F401
from yolo_tpu.train.loss import iou_score, yolo_loss  # noqa: F401
