"""Pipelined serving engine (lerf_tpu.serve): bounded-queue streaming over
the async dynamic forms must yield results in order and bit-identical to
the sequential warp_dynamic / upscale_dynamic calls, for every pipeline
depth — the overlap is pure scheduling, never arithmetic."""
import pytest
import jax
import numpy as np

from conftest import shared_lut_predictor, shared_net_predictor
from lerf_tpu.lut.io import LUTBank
from lerf_tpu.models import srnet
from lerf_tpu.pipeline import LutPredictor, NetPredictor, ServingFuture
from lerf_tpu.serve import stream_upscale, stream_warp

L4 = 17 ** 4
MODES = ("s", "c", "t")
IN_SZ = (37, 45)
OUT_SZ = (52, 40)


def _lut_predictor(linear=False):
    rng = np.random.RandomState(7)
    oc = 1 if linear else 3
    bank = LUTBank(
        stage1={m: rng.randint(-127, 128, (L4, 1)).astype(np.int8)
                for m in MODES},
        stage2={f"{m}r{r}": rng.randint(-127, 128, (L4, oc)).astype(np.int8)
                for m in MODES for r in (0, 1)},
        out_c=oc)
    return LutPredictor(bank, linear=linear)


def _matrices():
    rng = np.random.RandomState(3)
    mats = [
        np.array([[1.1, 0.02, 3.0], [0.01, 0.95, -2.0], [1e-4, 2e-5, 1.0]]),
        np.array([[0.7, -0.1, 10.0], [0.2, 1.3, -5.0], [5e-4, -2e-4, 1.0]]),
        np.diag([2.0, 2.0, 1.0]),
    ]
    for _ in range(2):
        mats.append(np.eye(3) + rng.randn(3, 3)
                    * np.array([[.05, .05, 4.0], [.05, .05, 4.0],
                                [1e-4, 1e-4, 0.0]]))
    return mats


def test_stream_warp_matches_sequential():
    pred = shared_lut_predictor()
    rng = np.random.RandomState(21)
    mats = _matrices()
    frames = [rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
              for _ in mats]
    want = [pred.warp_dynamic(f, m, OUT_SZ) for f, m in zip(frames, mats)]
    for depth in (1, 2, 4):
        got = list(stream_warp(pred, zip(frames, mats), OUT_SZ, depth=depth))
        assert len(got) == len(want)
        for (wo, wm), (go, gm) in zip(want, got):
            np.testing.assert_array_equal(wo, go)
            np.testing.assert_array_equal(wm, gm)
    # pipelining reuses the ONE dynamic program (key-scoped: shared pred)
    assert sum(1 for k in pred._warp_dyn_cache
               if k == (IN_SZ, OUT_SZ)) == 1


def test_stream_warp_bucketed_mixed_shapes():
    """granularity>0: one bucket program serves a stream of different image
    shapes, output shapes, and matrices — pipelined."""
    pred = shared_lut_predictor()
    rng = np.random.RandomState(22)
    cases = [((37, 45), (52, 40)), ((33, 41), (49, 44)),
             ((37, 45), (45, 47))]
    mats = _matrices()
    reqs = [(rng.randint(0, 256, (*i, 3), dtype=np.uint8), m, o)
            for (i, o), m in zip(cases, mats)]
    want = [pred.warp_dynamic(f, m, o, granularity=16) for f, m, o in reqs]
    got = []
    # out_hw varies per request here, so drive the async API directly the
    # way stream_warp does
    from collections import deque
    q = deque()
    for f, m, o in reqs:
        q.append(pred.warp_dynamic_async(f, m, o, granularity=16))
        while len(q) > 2:
            got.append(q.popleft().result())
    while q:
        got.append(q.popleft().result())
    for (wo, wm), (go, gm) in zip(want, got):
        np.testing.assert_array_equal(wo, go)
        np.testing.assert_array_equal(wm, gm)
    assert len([k for k in pred._warp_dyn_cache if k[0] == "bucket"]) == 1


@pytest.mark.smoke
def test_stream_upscale_matches_sequential():
    pred = shared_lut_predictor()
    rng = np.random.RandomState(23)
    # two distinct program keys (the third request reuses the first) —
    # multi-scale + program-reuse + ordering coverage at 2 CPU compiles
    scales = [(2.0, 2.0), (1.5, 2.0), (2.0, 2.0)]
    frames = [rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
              for _ in scales]
    reqs = [(f, sh, sw) for f, (sh, sw) in zip(frames, scales)]
    want = [pred.upscale_dynamic(f, sh, sw) for f, sh, sw in reqs]
    got = list(stream_upscale(pred, reqs, depth=2))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_net_stream_warp_matches_sequential():
    pred = shared_net_predictor()
    rng = np.random.RandomState(24)
    mats = _matrices()[:2]
    frames = [rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
              for _ in mats]
    want = [pred.warp_dynamic(f, m, OUT_SZ) for f, m in zip(frames, mats)]
    got = list(stream_warp(pred, zip(frames, mats), OUT_SZ, depth=2))
    for (wo, wm), (go, gm) in zip(want, got):
        np.testing.assert_array_equal(wo, go)
        np.testing.assert_array_equal(wm, gm)


def test_future_result_idempotent():
    pred = shared_lut_predictor()
    rng = np.random.RandomState(25)
    img = rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
    fut = pred.warp_dynamic_async(img, _matrices()[0], OUT_SZ)
    out1, mask1 = fut.result()
    out2, mask2 = fut.result()
    assert out1 is out2 and mask1 is mask2
    want_out, want_mask = pred.warp_dynamic(img, _matrices()[0], OUT_SZ)
    np.testing.assert_array_equal(want_out, out1)
    np.testing.assert_array_equal(want_mask, mask1)


def test_upscale_cli_streams_directory(tmp_path):
    """Several inputs + --dynamicSR: the CLI routes through the pipelined
    engine and writes one output per input, equal to single-image runs."""
    from PIL import Image

    from lerf_tpu.cli import upscale as up
    from lerf_tpu.lut.io import save_lut_bank

    rng = np.random.RandomState(26)
    bank = LUTBank(
        stage1={m: rng.randint(-127, 128, (L4, 1)).astype(np.int8)
                for m in MODES},
        stage2={f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int8)
                for m in MODES for r in (0, 1)},
        out_c=3)
    exp = tmp_path / "exp"
    exp.mkdir()
    save_lut_bank(bank, str(exp), lut_name="LUTft")
    src = tmp_path / "frames"
    src.mkdir()
    for i in range(3):
        Image.fromarray(rng.randint(0, 256, (12, 14, 3), dtype=np.uint8)) \
            .save(src / f"f{i}.png")
    dst = tmp_path / "out"
    up.main(["-e", str(exp), "--input", str(src), "--output", str(dst),
             "--scale", "2", "--dynamicSR", "--platform", "cpu"])
    outs = sorted(dst.iterdir())
    assert [p.name for p in outs] == ["f0.png", "f1.png", "f2.png"]
    # one single-image cross-check suffices: each up.main() builds a fresh
    # predictor and re-TRACES the dynamic program (~3 s, uncacheable);
    # frame-vs-frame equality of the engine itself is covered by
    # test_stream_upscale_matches_sequential
    single = up.main(["-e", str(exp), "--input", str(src / "f0.png"),
                      "--output", str(tmp_path / "one.png"),
                      "--scale", "2", "--dynamicSR", "--platform", "cpu"])
    np.testing.assert_array_equal(
        np.array(Image.open(outs[0]).convert("RGB")), single)


def test_upscale_cli_single_image_warp_mode(tmp_path):
    """--matrix switches the single-image CLI to homographic warping; the
    saved png must equal warp_dynamic's masked output (out-of-view black,
    the eval-driver convention)."""
    from PIL import Image

    from lerf_tpu.cli import upscale as up
    from lerf_tpu.lut.io import save_lut_bank

    rng = np.random.RandomState(27)
    bank = LUTBank(
        stage1={m: rng.randint(-127, 128, (L4, 1)).astype(np.int8)
                for m in MODES},
        stage2={f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int8)
                for m in MODES for r in (0, 1)},
        out_c=3)
    exp = tmp_path / "exp"
    exp.mkdir()
    save_lut_bank(bank, str(exp), lut_name="LUTft")
    img = rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "in.png")
    mat = _matrices()[0]
    out = up.main([
        "-e", str(exp), "--input", str(tmp_path / "in.png"),
        "--output", str(tmp_path / "out.png"),
        "--matrix", ",".join(str(v) for v in mat.ravel()),
        "--outSize", f"{OUT_SZ[0]}x{OUT_SZ[1]}", "--dynamicWarp",
        "--platform", "cpu"])
    pred = LutPredictor(bank)
    want_out, want_mask = pred.warp_dynamic(img, mat, OUT_SZ)
    want = want_out * np.asarray(want_mask, want_out.dtype)[..., None]
    np.testing.assert_array_equal(out, want)
    np.testing.assert_array_equal(
        np.array(Image.open(tmp_path / "out.png").convert("RGB")), want)


def test_async_fallback_resolves_eagerly(monkeypatch):
    """Outside the serving envelope the async variant must fall back to the
    exact per-shape path and hand back an already-resolved future."""
    pred = _lut_predictor()
    pred.supp_size = 3
    called = {}

    def fake_warp(img, matrix, out_hw, return_aux=False):
        called["yes"] = True
        return "out", "mask"

    monkeypatch.setattr(pred, "warp", fake_warp)
    fut = pred.warp_dynamic_async(
        np.zeros((8, 8, 3), np.uint8), np.eye(3), (8, 8))
    assert isinstance(fut, ServingFuture)
    assert called.get("yes") and fut.result() == ("out", "mask")


def test_upscale_cli_form_auto(tmp_path, monkeypatch):
    """--form auto resolves to the fastest form whose artifacts exist:
    net when a checkpoint is present, the bit-parity LUT bank otherwise
    (README "Choosing a serving form")."""
    from lerf_tpu.cli import upscale as up
    from lerf_tpu.lut.io import save_lut_bank

    rng = np.random.RandomState(30)
    bank = LUTBank(
        stage1={m: rng.randint(-127, 128, (L4, 1)).astype(np.int8)
                for m in MODES},
        stage2={f"{m}r{r}": rng.randint(-127, 128, (L4, 3)).astype(np.int8)
                for m in MODES for r in (0, 1)},
        out_c=3)
    exp = tmp_path / "exp"
    exp.mkdir()
    save_lut_bank(bank, str(exp), lut_name="LUTft")

    cfg = up.UpscaleConfig(exp_dir=str(exp), form="auto")
    pred = up.build_predictor(cfg)
    assert cfg.form == "lut" and isinstance(pred, LutPredictor)

    (exp / "ckpt").mkdir()                     # a checkpoint flips to net
    calls = {}
    monkeypatch.setattr("lerf_tpu.cli.eval_model.build_predictor",
                        lambda c: (calls.setdefault("net", c), "netpred")[1])
    cfg = up.UpscaleConfig(exp_dir=str(exp), form="auto")
    assert up.build_predictor(cfg) == "netpred"
    assert cfg.form == "net" and "net" in calls

    # "artifacts exist" is a path probe; if the net BUILD fails (torch
    # absent, orbax step mismatch) auto must fall back to the present
    # LUT bank instead of crashing — explicit --form net keeps the error
    monkeypatch.setattr(
        "lerf_tpu.cli.eval_model.build_predictor",
        lambda c: (_ for _ in ()).throw(ImportError("no torch")))
    cfg = up.UpscaleConfig(exp_dir=str(exp), form="auto")
    pred = up.build_predictor(cfg)
    assert cfg.form == "lut" and isinstance(pred, LutPredictor)
    cfg = up.UpscaleConfig(exp_dir=str(exp), form="net")
    with pytest.raises(ImportError):
        up.build_predictor(cfg)


def test_stream_warp_device_geometry_matches_sequential():
    """geometry="device" streams through warp_device_async; ordering and
    values must equal the sequential warp_device loop."""
    pred = shared_lut_predictor()
    rng = np.random.RandomState(28)
    mats = _matrices()[:2]
    frames = [rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
              for _ in mats]
    want = [pred.warp_device(f, m, OUT_SZ) for f, m in zip(frames, mats)]
    got = list(stream_warp(pred, zip(frames, mats), OUT_SZ, depth=2,
                           geometry="device"))
    for (wo, wm), (go, gm) in zip(want, got):
        np.testing.assert_array_equal(wo, go)
        np.testing.assert_array_equal(wm, gm)


def test_stream_warp_device_geometry_bucketed_mixed_shapes():
    """geometry="device" + granularity>0: a mixed-shape stream rides ONE
    bucketed device-geometry program (36 B of per-frame operand, zero
    recompiles) — values equal the sequential bucketed warp_device."""
    pred = shared_lut_predictor()
    rng = np.random.RandomState(29)
    shapes = [(37, 45), (33, 41)]
    mats = _matrices()[:2]
    frames = [rng.randint(0, 256, (*s, 3), dtype=np.uint8) for s in shapes]
    want = [pred.warp_device(f, m, OUT_SZ, granularity=16)
            for f, m in zip(frames, mats)]
    got = list(stream_warp(pred, zip(frames, mats), OUT_SZ, depth=2,
                           geometry="device", granularity=16))
    for (wo, wm), (go, gm) in zip(want, got):
        np.testing.assert_array_equal(wo, go)
        np.testing.assert_array_equal(wm, gm)
    assert len([k for k in pred._warp_dyn_cache
                if k[0] == "devgeo_bucket"]) == 1
