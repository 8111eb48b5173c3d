from yolo_tpu.ops.blocks import (  # noqa: F401
    conv2d,
    conv_block,
    init_conv,
    init_conv_block,
    leaky_relu,
    max_pool,
    reorg,
    spp,
    upsample2x,
)
from yolo_tpu.ops.decode import (  # noqa: F401
    decode_boxes,
    decode_xywh,
    make_grid,
    split_predictions,
)
from yolo_tpu.ops.nms import (  # noqa: F401
    batched_postprocess,
    nms_greedy_numpy,
    postprocess_jax,
    postprocess_numpy,
)
