"""CLI entry-point smoke tests (synthetic data, tiny shapes)."""

import os

import numpy as np
import pytest


def test_train_cli_debug(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from yolo_tpu.cli.train import parse_args, train

    args = parse_args([
        "-v", "slim_yolo_v2", "-d", "synthetic", "--input_size", "32", "32",
        "-b", "4", "--max_epoch", "1", "--eval_epoch", "1", "--debug",
        "--num_workers", "2", "--save_folder", str(tmp_path / "w")])
    params = train(args)
    assert params is not None
    # checkpoint written with optimizer state
    ckpts = list((tmp_path / "w").rglob("*.msgpack"))
    assert len(ckpts) == 1
    from yolo_tpu.utils.checkpoint import load_checkpoint
    _, extra = load_checkpoint(str(ckpts[0]))
    assert "opt_state" in extra and extra["epoch"] == 1


def test_kmeans_cli():
    from yolo_tpu.cli.kmeans import main, parse_args

    args = parse_args(["-d", "synthetic", "-na", "3",
                       "--input_size", "32", "32"])
    anchors, avg_iou = main(args)
    assert anchors.shape == (3, 2)
    assert 0.3 < avg_iou <= 1.0


def test_quantize_cli_bnfold(tmp_path):
    import jax

    from yolo_tpu.cli.quantize import main, parse_args
    from yolo_tpu.config import get_config
    from yolo_tpu.detector import Detector
    from yolo_tpu.utils.checkpoint import save_checkpoint

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    src = str(tmp_path / "m.msgpack")
    save_checkpoint(src, params)

    out = str(tmp_path / "fused.msgpack")
    args = parse_args(["bnfold", "-v", "slim_yolo_v2", "-d", "synthetic",
                       "--input_size", "32", "32", "-r", src,
                       "--out", out, "--no_eval"])
    fused = main(args)
    assert os.path.exists(out)
    assert "bn" not in fused["conv1"] and "b" in fused["conv1"]


def test_quantize_cli_findbest(tmp_path):
    import jax

    from yolo_tpu.cli.quantize import main, parse_args
    from yolo_tpu.config import get_config
    from yolo_tpu.detector import Detector
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.utils.checkpoint import save_checkpoint

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    det = Detector(cfg)
    fused = fold_batch_norm(det.init_params(jax.random.PRNGKey(0)))
    src = str(tmp_path / "fused.msgpack")
    save_checkpoint(src, fused)

    args = parse_args(["findbest", "-v", "slim_yolo_v2_q_bf",
                       "-d", "synthetic", "--input_size", "32", "32",
                       "-r", src, "--calib_images", "8",
                       "--batch_size", "4", "--no_eval"])
    tables = main(args)
    assert len(tables["retune"]) == 10
    assert all(isinstance(v, int) for v in tables["retune"])


def test_quantize_cli_export_artifact(tmp_path):
    """export stage writes weight.h AND (with --artifact) a serialized
    serving blob that reloads and runs without model code."""
    import jax
    import numpy as np

    from yolo_tpu.cli.quantize import main, parse_args
    from yolo_tpu.config import get_config
    from yolo_tpu.detector import Detector
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.serving.export import load_artifact
    from yolo_tpu.utils.checkpoint import save_checkpoint

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    det = Detector(cfg)
    fused = fold_batch_norm(det.init_params(jax.random.PRNGKey(0)))
    src = str(tmp_path / "fused.msgpack")
    save_checkpoint(src, fused)

    header = str(tmp_path / "weight.h")
    blob = str(tmp_path / "slim.stablehlo")
    args = parse_args(["export", "-v", "slim_yolo_v2_q_bf",
                       "-d", "synthetic", "--input_size", "32", "32",
                       "-r", src, "--calib_images", "8",
                       "--batch_size", "2", "--head_clip", "none",
                       "--header", header, "--artifact", blob,
                       "--no_eval"])
    main(args)
    assert os.path.exists(header) and os.path.getsize(header) > 100
    serve, meta = load_artifact(blob, with_meta=True)
    assert meta["input"] == "f32" and meta["batch"] == 2
    x = np.random.default_rng(0).random((2, 32, 32, 3), np.float32)
    boxes, scores, classes, valid = (np.asarray(a) for a in serve(x))
    assert boxes.shape == (2, cfg.top_k, 4)
    assert np.isfinite(scores).all()


def test_serve_cli_from_artifact(tmp_path):
    """quantize export --artifact_input s2d -> serve --artifact: the
    frozen blob's header wires the full input pipeline (s2d layout +
    host quantization exponent) with no model code in the serving
    process."""
    import jax
    import numpy as np

    from yolo_tpu.cli.quantize import main, parse_args
    from yolo_tpu.cli.serve import main as serve_main
    from yolo_tpu.cli.serve import parse_args as serve_args
    from yolo_tpu.config import get_config
    from yolo_tpu.detector import Detector
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.utils.checkpoint import save_checkpoint

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    fused = fold_batch_norm(
        Detector(cfg).init_params(jax.random.PRNGKey(0)))
    src = str(tmp_path / "fused.msgpack")
    save_checkpoint(src, fused)

    blob = str(tmp_path / "slim_s2d.stablehlo")
    main(parse_args(["export", "-v", "slim_yolo_v2_q_bf",
                     "-d", "synthetic", "--input_size", "32", "32",
                     "-r", src, "--calib_images", "8",
                     "--batch_size", "4", "--head_clip", "none",
                     "--header", str(tmp_path / "weight.h"),
                     "--artifact", blob, "--artifact_input", "s2d",
                     "--no_eval"]))
    fps = serve_main(serve_args(["--artifact", blob, "--iters", "2",
                                 "-d", "synthetic"]))
    assert fps > 0


def test_export_artifact_any_family(tmp_path):
    """export -v tiny_yolo_v3 --artifact: family-generic artifact via
    the int8 dispatch (weight.h stays slim-only), servable end-to-end."""
    from yolo_tpu.cli.quantize import main, parse_args
    from yolo_tpu.cli.serve import main as serve_main
    from yolo_tpu.cli.serve import parse_args as serve_args

    blob = str(tmp_path / "tiny_s2d.stablehlo")
    main(parse_args(["export", "-v", "tiny_yolo_v3", "-d", "synthetic",
                     "--input_size", "64", "64", "--calib_images", "8",
                     "--batch_size", "4", "--head_clip", "none",
                     "--artifact", blob, "--artifact_input", "s2d",
                     "--no_eval"]))
    fps = serve_main(serve_args(["--artifact", blob, "--iters", "2",
                                 "-d", "synthetic"]))
    assert fps > 0


def test_serve_cli_fake(monkeypatch):
    """serve CLI with the FP32 path on synthetic frames."""
    from yolo_tpu.cli.serve import main, parse_args

    args = parse_args(["-v", "slim_yolo_v2", "-d", "synthetic",
                       "--input_size", "32", "32", "--batch", "4",
                       "--iters", "2", "--fp32"])
    fps = main(args)
    assert fps > 0


def test_serve_cli_int8_dispatch():
    """serve -v tiny_yolo_v3 must serve tiny's OWN integer engine (the
    CLI used to build the slim graph for every version)."""
    from yolo_tpu.cli.serve import main, parse_args

    args = parse_args(["-v", "tiny_yolo_v3", "-d", "synthetic",
                       "--input_size", "64", "64", "--batch", "4",
                       "--iters", "2"])
    fps = main(args)
    assert fps > 0


def test_visual_test_cli_int8_dispatch(tmp_path, monkeypatch):
    """test -q must dispatch on -v to each family's integer engine
    (ADVICE r2: the slim-only pipeline KeyError'd on other versions)."""
    pytest.importorskip("cv2")
    from yolo_tpu.cli.test import parse_args, test as run_test

    for version in ("slim_yolo_v2", "tiny_yolo_v3"):
        out = tmp_path / version
        args = parse_args([
            "-v", version, "-d", "synthetic", "--input_size", "64", "64",
            "-q", "--num_images", "2", "--output", str(out)])
        run_test(args)
        assert sorted(p.name for p in out.iterdir()) == ["0.jpg", "1.jpg"]


def test_int8_dispatch_unknown_version():
    from yolo_tpu.quant.dispatch import build_int8_detector

    with pytest.raises(ValueError, match="no INT8 engine"):
        build_int8_detector("nope", None, None, [])


def test_demo_cli_image_mode(tmp_path):
    """Demo image mode: detect over a dir of jpgs, write annotated jpgs
    (reference demo.py:100-121)."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from yolo_tpu.cli.demo import detect, parse_args

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(img_dir / f"f{i}.jpg"),
                    rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    out_dir = tmp_path / "out"
    args = parse_args([
        "-v", "slim_yolo_v2", "-d", "synthetic",
        "--input_size", "32", "32",
        "--mode", "image", "--path_to_img", str(img_dir),
        "--path_to_save", str(out_dir)])
    detect(args)
    assert sorted(p.name for p in out_dir.iterdir()) == ["0.jpg", "1.jpg"]


def test_demo_cli_video_mode(tmp_path):
    """Demo video mode: read a tiny .avi, write the annotated det.avi
    (reference demo.py:124-158)."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from yolo_tpu.cli.demo import detect, parse_args

    vid = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"XVID"), 10.0,
                        (64, 48))
    rng = np.random.default_rng(1)
    for _ in range(3):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()

    out_dir = tmp_path / "out"
    args = parse_args([
        "-v", "slim_yolo_v2", "-d", "synthetic",
        "--input_size", "32", "32",
        "--mode", "video", "--path_to_vid", vid,
        "--path_to_save", str(out_dir)])
    detect(args)
    assert (out_dir / "det.avi").exists()
    cap = cv2.VideoCapture(str(out_dir / "det.avi"))
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 3


def test_quantize_cli_qat(tmp_path):
    import jax

    from yolo_tpu.cli.quantize import main, parse_args
    from yolo_tpu.config import get_config
    from yolo_tpu.detector import Detector
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.utils.checkpoint import save_checkpoint

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    det = Detector(cfg)
    fused = fold_batch_norm(det.init_params(jax.random.PRNGKey(0)))
    src = str(tmp_path / "fused.msgpack")
    save_checkpoint(src, fused)

    out = str(tmp_path / "qat.msgpack")
    args = parse_args(["qat", "-v", "slim_yolo_v2_q_bf",
                       "-d", "synthetic", "--input_size", "32", "32",
                       "-r", src, "--calib_images", "8",
                       "--batch_size", "4", "--steps", "2",
                       "--head_clip", "16", "--out", out, "--no_eval"])
    params = main(args)
    assert os.path.exists(out)
    # fine-tuned masters stay fp32 and finite
    for leaf in jax.tree_util.tree_leaves(params):
        import numpy as np
        assert np.isfinite(np.asarray(leaf)).all()


def test_quantize_cli_qat_grid_options(tmp_path):
    """--weight_bits/--per_channel thread the serving grid into the QAT
    stage (STE weights on the sub-8/per-channel pow2 grid)."""
    import jax

    from yolo_tpu.cli.quantize import main, parse_args
    from yolo_tpu.config import get_config
    from yolo_tpu.detector import Detector
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.utils.checkpoint import save_checkpoint

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    det = Detector(cfg)
    fused = fold_batch_norm(det.init_params(jax.random.PRNGKey(0)))
    src = str(tmp_path / "fused.msgpack")
    save_checkpoint(src, fused)

    out = str(tmp_path / "qat_w4pc.msgpack")
    args = parse_args(["qat", "-v", "slim_yolo_v2_q_bf",
                       "-d", "synthetic", "--input_size", "32", "32",
                       "-r", src, "--calib_images", "8",
                       "--batch_size", "4", "--steps", "2",
                       "--weight_bits", "4", "--per_channel",
                       "--head_clip", "16", "--out", out, "--no_eval"])
    params = main(args)
    assert os.path.exists(out)
    for leaf in jax.tree_util.tree_leaves(params):
        import numpy as np
        assert np.isfinite(np.asarray(leaf)).all()
