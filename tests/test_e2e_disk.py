"""Full reference-pipeline integration test ON DISK (VERDICT r1 item
#10): build a tiny VOC-mask fixture tree (XML + JPEG), then run the
complete chain the reference implements as four scripts —
train -> evaluate -> BN-fold -> PTQ calibrate -> retune search ->
integer model -> weight.h export — end to end through files, not just
in-memory objects. (Reference chain: train.py -> conv+bn2conv.py ->
retune_bias_quantize.py -q -> retune_bias_quantize_findbest.py ->
c_embedding/weight.h.)"""

import os
import xml.etree.ElementTree as ET

import jax
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

N_IMAGES = 5
SIZE = 64  # tiny input so CPU jit stays fast


def _write_voc_mask_tree(root):
    """5 images, each one bright rectangle labeled face/face_mask."""
    mask_dir = root / "Mask"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (mask_dir / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(N_IMAGES):
        name = f"img{i:03d}"
        names.append(name)
        h = w = 96
        img = (rng.random((h, w, 3)) * 40).astype(np.uint8)
        x1, y1 = 10 + 6 * i, 12 + 5 * i
        x2, y2 = x1 + 40, y1 + 36
        cls = ("face", "face_mask")[i % 2]
        img[y1:y2, x1:x2] = (40 + 180 * (i % 2), 220 - 150 * (i % 2), 200)
        cv2.imwrite(str(mask_dir / "JPEGImages" / f"{name}.jpg"), img)

        ann = ET.Element("annotation")
        size = ET.SubElement(ann, "size")
        for tag, v in (("width", w), ("height", h), ("depth", 3)):
            ET.SubElement(size, tag).text = str(v)
        obj = ET.SubElement(ann, "object")
        ET.SubElement(obj, "name").text = cls
        ET.SubElement(obj, "difficult").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        for tag, v in (("xmin", x1 + 1), ("ymin", y1 + 1),
                       ("xmax", x2 + 1), ("ymax", y2 + 1)):
            ET.SubElement(bb, tag).text = str(v)
        ET.ElementTree(ann).write(
            str(mask_dir / "Annotations" / f"{name}.xml"))
    for split in ("train", "test"):
        with open(mask_dir / "ImageSets" / "Main" / f"{split}.txt",
                  "w") as f:
            f.write("\n".join(names) + "\n")
    return root


def test_full_pipeline_on_disk(tmp_path):
    root = _write_voc_mask_tree(tmp_path)

    # --- stage 1: train 2 epochs via the real CLI ----------------------
    from yolo_tpu.cli.train import parse_args, train

    save = tmp_path / "weights"
    args = parse_args([
        "-v", "slim_yolo_v2", "-d", "mask",
        "--dataset_root", str(root),
        "--input_size", str(SIZE), str(SIZE),
        "-b", "5", "--max_epoch", "2", "--eval_epoch", "2",
        "--num_workers", "2", "--save_folder", str(save),
    ])
    params = train(args)
    ckpts = list((save / "mask" / "slim_yolo_v2").glob("*.msgpack"))
    assert ckpts, "train CLI saved no checkpoint"
    assert (save / "mask" / "slim_yolo_v2" / "metrics.jsonl").exists()

    # --- stage 2: evaluate from the checkpoint file --------------------
    from yolo_tpu.config import get_config
    from yolo_tpu.data import BaseTransform
    from yolo_tpu.data.voc import VOCDetection
    from yolo_tpu.detector import Detector
    from yolo_tpu.eval.voc_eval import VOCEvaluator
    from yolo_tpu.utils.checkpoint import load_checkpoint

    cfg = get_config("slim_yolo_v2", "mask", input_size=(SIZE, SIZE))
    det = Detector(cfg)
    params, extra = load_checkpoint(str(ckpts[0]))
    assert extra["epoch"] == 2
    ds = VOCDetection.mask(str(root), "test",
                           transform=BaseTransform((SIZE, SIZE)))
    out_dir = tmp_path / "eval_out"
    ev = VOCEvaluator(ds, cfg.num_classes, cfg.input_size, batch_size=5,
                      output_dir=str(out_dir),
                      class_names=["face", "face_mask"])
    mean_ap = ev.evaluate(lambda imgs: det.detect(params, imgs))
    assert 0.0 <= mean_ap <= 1.0
    # evaluator artifacts (reference vocapi_evaluator_mask.py:59,140-155)
    assert (out_dir / "detections.pkl").exists()
    assert (out_dir / "det_test_face.txt").exists()
    assert (out_dir / "face_mask_pr.pkl").exists()

    # --- stage 3: quantize chain: fold -> calibrate -> retune ----------
    from yolo_tpu.quant.int8_graph import (
        make_int8_detect_fn, quantize_pipeline)

    calib = np.stack([ds.pull_item(i)[0] for i in range(len(ds))])
    m = quantize_pipeline(params, cfg, [calib.astype(np.float32)])
    assert set(m.retune)  # per-layer retune table found

    # quantized model still detects on the fixture images
    detect = make_int8_detect_fn(m, cfg)
    boxes, scores, classes, valid = (
        np.asarray(a) for a in detect(calib.astype(np.float32)))
    assert boxes.shape[0] == N_IMAGES

    # --- stage 4: weight.h export (c_embedding equivalent) -------------
    from yolo_tpu.quant.retune import export_c_header

    header = tmp_path / "weight.h"
    export_c_header(m, str(header))
    text = header.read_text()
    assert "scale_w" in text and "retune" in text
    assert os.path.getsize(header) > 1000
