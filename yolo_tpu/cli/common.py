"""Shared CLI plumbing: the argparse surface the reference copies into
every entry point (train.py:27-70, retune_bias_quantize.py:25-70, ...)
defined once, plus dataset/evaluator construction."""

from __future__ import annotations

import argparse

import numpy as np

from yolo_tpu.config import get_config
from yolo_tpu.data import BaseTransform, SSDAugmentation, SyntheticDetection
from yolo_tpu.data.voc import VOC_CLASSES, VOC_CLASSES_MASK, VOCDetection


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument("-v", "--version", default="slim_yolo_v2",
                        help="model version: slim_yolo_v2, slim_yolo_v2_q_bf,"
                             " yolo_v2, yolo_v3, yolo_v3_spp, tiny_yolo_v3")
    parser.add_argument("-d", "--dataset", default="mask",
                        help="voc, coco, mask or synthetic")
    parser.add_argument("--dataset_root", default="data/VOCdevkit",
                        help="dataset root directory")
    parser.add_argument("-hr", "--high_resolution", action="store_true",
                        default=False, help="use hi-res backbone")
    parser.add_argument("--input_size", type=int, nargs=2, default=None,
                        metavar=("H", "W"), help="model input size")
    parser.add_argument("--conf_thresh", type=float, default=0.01)
    parser.add_argument("--nms_thresh", type=float, default=0.5)
    return parser


def build_cfg(args):
    kwargs = {}
    if args.input_size is not None:
        kwargs["input_size"] = tuple(args.input_size)
    dataset = "mask" if args.dataset == "synthetic" else args.dataset
    return get_config(args.version, dataset,
                      conf_thresh=args.conf_thresh,
                      nms_thresh=args.nms_thresh,
                      hr=args.high_resolution, **kwargs)


def build_dataset(args, cfg, train: bool = True, seed: int = 0,
                  u8: bool = False):
    """Dataset dispatch (reference train.py:108-157). ``u8`` keeps
    training batches as raw uint8 (normalization then runs in-graph,
    detector.normalize_u8 — 4x less host->device traffic)."""
    size = cfg.input_size
    transform = (SSDAugmentation(size, seed=seed, normalize=not u8)
                 if train else BaseTransform(size))
    if args.dataset == "synthetic":
        return SyntheticDetection(size=size, num_classes=cfg.num_classes,
                                  transform=transform,
                                  length=128 if train else 32,
                                  seed=0 if train else 1)
    if args.dataset == "voc":
        sets = ((("2007", "trainval"), ("2012", "trainval")) if train
                else (("2007", "test"),))
        return VOCDetection(args.dataset_root, image_sets=sets,
                            classes=VOC_CLASSES, transform=transform)
    if args.dataset == "mask":
        return VOCDetection.mask(args.dataset_root,
                                 "train" if train else "test",
                                 transform=transform)
    if args.dataset == "coco":
        from yolo_tpu.data.coco import COCODataset
        json_file = ("instances_train2017.json" if train
                     else "instances_val2017.json")
        name = "train2017" if train else "val2017"
        return COCODataset(args.dataset_root, json_file=json_file,
                           name=name, transform=transform)
    raise ValueError(f"unknown dataset {args.dataset!r}")
