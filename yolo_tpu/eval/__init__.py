from yolo_tpu.eval.voc_eval import (  # noqa: F401
    VOCEvaluator,
    voc_ap,
    voc_eval_class,
)
