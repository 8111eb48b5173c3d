"""Batched multi-stream detection pipeline: frames -> boxes.

The TPU-serving replacement for the reference's embedded camera loop
(c_embedding/main.c:35-54: camera IRQ -> yolo_forward -> VGA draw): many
camera/video streams feed a batcher; preprocessing runs in native C++
threads (yolo_tpu.utils.native, falling back to numpy); the whole batch
executes as one jitted int8 XLA program (conv -> decode -> NMS); host
code only unpacks fixed-shape results.

Double-buffering the host->device transfer against device compute plays
the role of the reference's ping-pong BRAMs (yolo_forward.c:259-267).
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from yolo_tpu.config import DetectorConfig


class StreamingDetector:
    """Batches frames and runs the fused int8 detect graph.

    Args:
      cfg: detector config (input size, thresholds, top_k).
      detect_fn: jitted fn images[B,H,W,3]f32 (or int8) ->
        (boxes, scores, classes, valid). Build with
        yolo_tpu.quant.int8_graph.make_int8_detect_fn or Detector.detect.
      batch_size: static batch the graph was compiled for.
    """

    def __init__(self, cfg: DetectorConfig, detect_fn: Callable,
                 batch_size: int = 64, use_native: bool = True,
                 letterbox: bool = False, sa_in: Optional[int] = None,
                 s2d: bool = False):
        self.cfg = cfg
        self.detect_fn = detect_fn
        self.batch_size = batch_size
        self.letterbox = letterbox
        # sa_in: the int8 activation scale exponent of the detect graph's
        # input (Int8Model.sa['in']). When set, preprocessing emits int8
        # directly — the host-side-quantize pattern of the reference's
        # embedded engine (c_embedding/yolo_forward.c:57-85) — so
        # host->device moves 4x fewer bytes and the in-graph quantize op
        # disappears. detect_fn must accept int8 input
        # (make_int8_detect_fn handles both dtypes).
        self.sa_in = sa_in
        # s2d: additionally emit the padded space-to-depth layout (the
        # detect graph must be built with input_s2d=True) — conv1+pool
        # fuse onto the MXU with zero on-device transform cost.
        if s2d and sa_in is None:
            raise ValueError("s2d layout requires sa_in")
        self.s2d = s2d
        self._lb_meta = None
        self._native = None
        if use_native:
            try:
                from yolo_tpu.utils import native
                if native.available():
                    self._native = native
            except Exception:
                self._native = None

    # -- preprocessing ------------------------------------------------------

    def preprocess(self, frames: Sequence[np.ndarray]) -> np.ndarray:
        """u8 BGR frames (any sizes) -> normalized float32 batch, or an
        int8 batch at scale 2^sa_in when the detector takes int8."""
        from yolo_tpu.data.transforms import BaseTransform, letterbox

        if self.letterbox:
            canvases, metas = [], []
            for f in frames:
                canvas, scale, pads = letterbox(f, self.cfg.input_size)
                canvases.append(canvas)
                metas.append((scale, pads))
            self._lb_meta = metas
            frames = canvases
            # letterboxed canvases all share the input size; the native
            # path then only normalizes/flips
        if self._native is not None:
            return self._native.preprocess_batch(
                list(frames), self.cfg.input_size,
                int8_scale=(2.0 ** self.sa_in
                            if self.sa_in is not None else None),
                layout="s2d" if self.s2d else "nhwc")
        t = BaseTransform(self.cfg.input_size)
        batch = np.stack([t(f)[0] for f in frames])
        if self.sa_in is not None:
            batch = np.clip(np.rint(batch * (2.0 ** self.sa_in)),
                            -128, 127).astype(np.int8)
            if self.s2d:
                from yolo_tpu.quant.fixed_point import s2d_input_np
                batch = s2d_input_np(batch)
        return batch

    # -- detection ----------------------------------------------------------

    def detect_frames(self, frames: Sequence[np.ndarray]):
        """Detect on a list of frames (padded to the static batch).

        Returns a list of (boxes_px [K,4], scores [K], classes [K]) per
        frame, thresholded to valid detections, boxes in original-frame
        pixels.
        """
        n = len(frames)
        batch = self.preprocess(frames)
        if n < self.batch_size:
            pad = np.zeros((self.batch_size - n,) + batch.shape[1:],
                           batch.dtype)
            batch = np.concatenate([batch, pad])
        return self._postprocess(frames, self.detect_fn(batch))

    # -- streaming with prefetch --------------------------------------------

    def detect_stream(self, frame_batches):
        """Iterate detection over a stream of frame lists with a real
        prefetch thread: batch n+1 is preprocessed (and starts its
        host->device transfer) while the device computes batch n — the
        TPU role of the reference's ping-pong BRAMs
        (c_embedding/yolo_forward.c:259-267). Yields detect_frames-style
        results per input batch."""
        from concurrent.futures import ThreadPoolExecutor

        it = iter(frame_batches)
        with ThreadPoolExecutor(1) as ex:

            def stage(frames):
                # device_put here (not in the consumer): the transfer of
                # batch n+1 overlaps the device compute of batch n, and
                # the jit call later dispatches on an already-committed
                # array (dispatch-with-numpy-operand transfers
                # synchronously — ~10x the cost of a plain device_put
                # over a high-latency link).
                import jax
                return frames, jax.device_put(self.preprocess(frames))

            try:
                fut = ex.submit(stage, next(it))
            except StopIteration:
                return
            while fut is not None:
                frames, batch = fut.result()
                fut = None
                try:
                    fut = ex.submit(stage, next(it))
                except StopIteration:
                    pass
                yield self._postprocess(frames, self.detect_fn(batch))

    def _postprocess(self, frames, raw):
        boxes, scores, classes, valid = (np.asarray(a) for a in raw)
        out = []
        for i, frame in enumerate(frames):
            h, w = frame.shape[:2]
            keep = valid[i]
            kept = boxes[i][keep]
            if self.letterbox and self._lb_meta:
                from yolo_tpu.data.transforms import unletterbox_boxes
                scale, pads = self._lb_meta[i]
                px_boxes = unletterbox_boxes(kept.copy(),
                                             self.cfg.input_size, scale,
                                             pads)
            else:
                px_boxes = kept * [w, h, w, h]
            out.append((px_boxes, scores[i][keep], classes[i][keep]))
        return out

    # -- throughput bench ----------------------------------------------------

    def benchmark(self, frames: Sequence[np.ndarray], iters: int = 20,
                  overlap: bool = True):
        """End-to-end host->device->host throughput (frames/sec).

        ``overlap=True`` uses the prefetch thread (preprocess n+1
        concurrent with device compute + input transfer of n);
        ``overlap=False`` is the sequential reference for measuring the
        prefetch gain."""
        import jax

        batch = self.preprocess(frames[:self.batch_size])
        jax.device_get(self.detect_fn(batch))  # warmup/compile

        if overlap:
            from concurrent.futures import ThreadPoolExecutor

            def stage():
                # preprocess + H2D both in the producer thread (see
                # detect_stream.stage for why device_put lives here)
                return jax.device_put(
                    self.preprocess(frames[:self.batch_size]))

            with ThreadPoolExecutor(1) as ex:
                fut = ex.submit(stage)
                t0 = time.perf_counter()
                for _ in range(iters):
                    batch = fut.result()
                    fut = ex.submit(stage)
                    out = self.detect_fn(batch)
                jax.device_get(out)
                dt = time.perf_counter() - t0
                fut.result()
        else:
            t0 = time.perf_counter()
            for _ in range(iters):
                batch = self.preprocess(frames[:self.batch_size])
                out = self.detect_fn(batch)
            jax.device_get(out)
            dt = time.perf_counter() - t0
        return self.batch_size * iters / dt
