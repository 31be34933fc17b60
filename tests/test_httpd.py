"""HTTP serving daemon (lerf_tpu.serve.httpd): the network surface must be
bit-exact to the in-process dynamic predictors — npy in → npy out equals
upscale_dynamic / warp_dynamic — and concurrent clients must each get
their own correct frame (the dispatch lock serializes device entry, the
transport never mixes responses)."""
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from lerf_tpu.lut.io import LUTBank
from lerf_tpu.pipeline import LutPredictor
from lerf_tpu.serve import make_server

L4 = 17 ** 4
MODES = ("s", "c", "t")
IN_SZ = (37, 45)
OUT_SZ = (52, 40)
MAT = np.array([[1.1, 0.02, 3.0], [0.01, 0.95, -2.0], [1e-4, 2e-5, 1.0]])


def _lut_predictor():
    # the conftest process-wide canonical predictor (same seed-7 bank this
    # module always used): dynamic programs traced by the serving suites
    # are shared with the daemon tests instead of re-traced
    from conftest import shared_lut_predictor
    return shared_lut_predictor()


@pytest.fixture(scope="module")
def served():
    pred = _lut_predictor()
    server = make_server(pred, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield pred, base
    server.shutdown()


def _post(url, body, ctype="application/x-npy"):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    return urllib.request.urlopen(req, timeout=600)


def _post_npy(url, img):
    buf = io.BytesIO()
    np.save(buf, img)
    resp = _post(url, buf.getvalue())
    return resp, np.load(io.BytesIO(resp.read()), allow_pickle=False)


def test_healthz(served):
    _, base = served
    with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
        info = json.loads(resp.read())
    assert info["ok"] and info["form"] == "LutPredictor"


@pytest.mark.smoke
def test_upscale_npy_bit_exact(served):
    pred, base = served
    img = np.random.RandomState(21).randint(
        0, 256, (*IN_SZ, 3), dtype=np.uint8)
    resp, got = _post_npy(base + "/v1/upscale?scale=1.5x2.0", img)
    assert resp.headers["Content-Type"] == "application/x-npy"
    np.testing.assert_array_equal(got, pred.upscale_dynamic(img, 1.5, 2.0))


def test_upscale_downscale_aa(served):
    """Anti-aliased downscales serve through the same daemon programs
    (round-4 support-bucket envelope), bit-exact to the in-process
    predictor."""
    pred, base = served
    img = np.random.RandomState(22).randint(
        0, 256, (*IN_SZ, 3), dtype=np.uint8)
    resp, got = _post_npy(base + "/v1/upscale?scale=0.5", img)
    np.testing.assert_array_equal(got, pred.upscale_dynamic(img, 0.5, 0.5))


def test_upscale_png_round_trip(served):
    from PIL import Image

    pred, base = served
    img = np.random.RandomState(22).randint(
        0, 256, (*IN_SZ, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    resp = _post(base + "/v1/upscale?scale=1.5x2.0", buf.getvalue(),
                 ctype="image/png")
    assert resp.headers["Content-Type"] == "image/png"
    got = np.array(Image.open(io.BytesIO(resp.read())).convert("RGB"))
    np.testing.assert_array_equal(got, pred.upscale_dynamic(img, 1.5, 2.0))


def test_warp_npz_bit_exact(served):
    pred, base = served
    img = np.random.RandomState(23).randint(
        0, 256, (*IN_SZ, 3), dtype=np.uint8)
    mat = ",".join(str(v) for v in MAT.ravel())
    buf = io.BytesIO()
    np.save(buf, img)
    resp = _post(f"{base}/v1/warp?matrix={mat}"
                 f"&outSize={OUT_SZ[0]}x{OUT_SZ[1]}&format=npz",
                 buf.getvalue())
    pack = np.load(io.BytesIO(resp.read()), allow_pickle=False)
    want_out, want_mask = pred.warp_dynamic(img, MAT, OUT_SZ)
    np.testing.assert_array_equal(pack["out"], want_out)
    np.testing.assert_array_equal(pack["mask"], np.asarray(want_mask))


def test_warp_npy_masked_with_coverage_header(served):
    pred, base = served
    img = np.random.RandomState(24).randint(
        0, 256, (*IN_SZ, 3), dtype=np.uint8)
    mat = ",".join(str(v) for v in MAT.ravel())
    resp, got = _post_npy(
        f"{base}/v1/warp?matrix={mat}&outSize={OUT_SZ[0]}x{OUT_SZ[1]}", img)
    want_out, want_mask = pred.warp_dynamic(img, MAT, OUT_SZ)
    mask = np.asarray(want_mask)
    np.testing.assert_array_equal(
        got, want_out * mask.astype(want_out.dtype)[..., None])
    assert abs(float(resp.headers["X-Lerf-Mask-Coverage"])
               - mask.mean()) < 1e-5


def test_concurrent_clients_get_their_own_frames(served):
    pred, base = served
    rng = np.random.RandomState(25)
    imgs = [rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
            for _ in range(4)]
    want = [pred.upscale_dynamic(im, 1.5, 2.0) for im in imgs]
    got = [None] * len(imgs)

    def worker(i):
        _, got[i] = _post_npy(base + "/v1/upscale?scale=1.5x2.0", imgs[i])

    ts = [threading.Thread(target=worker, args=(i,))
          for i in range(len(imgs))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_healthz_latency_stats_accumulate(served):
    """After requests have been served, /healthz reports dispatch/total
    latency percentiles over the sliding window (runs after the request
    tests above in file order)."""
    _, base = served
    with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
        info = json.loads(resp.read())
    assert info["served"] >= 1
    assert info["total"]["n"] >= 1
    assert info["total"]["p50_ms"] >= info["dispatch"]["p50_ms"] >= 0


def test_max_inflight_one_still_correct_under_concurrency():
    """With the in-flight cap at 1 (fully serialized device pipeline),
    concurrent clients still each get their own correct frame — the cap
    is backpressure, never reordering."""
    pred = _lut_predictor()
    server = make_server(pred, port=0, max_inflight=1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    rng = np.random.RandomState(30)
    imgs = [rng.randint(0, 256, (*IN_SZ, 3), dtype=np.uint8)
            for _ in range(3)]
    want = [pred.upscale_dynamic(im, 1.5, 2.0) for im in imgs]
    got = [None] * len(imgs)

    def worker(i):
        _, got[i] = _post_npy(base + "/v1/upscale?scale=1.5x2.0", imgs[i])

    ts = [threading.Thread(target=worker, args=(i,))
          for i in range(len(imgs))]
    try:
        for th in ts:
            th.start()
        for th in ts:
            th.join()
    finally:
        server.shutdown()
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_net_form_daemon_bit_exact():
    """The daemon serves NetPredictor forms identically (one shared HTTP
    surface for the LUT and network deploy forms)."""
    from conftest import shared_net_predictor

    pred = shared_net_predictor()
    server = make_server(pred, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    img = np.random.RandomState(31).randint(
        0, 256, (*IN_SZ, 3), dtype=np.uint8)
    try:
        _, got = _post_npy(base + "/v1/upscale?scale=1.5x2.0", img)
    finally:
        server.shutdown()
    np.testing.assert_array_equal(got, pred.upscale_dynamic(img, 1.5, 2.0))


def test_bad_requests_return_400(served):
    _, base = served
    img = np.zeros((8, 8, 3), np.uint8)
    buf = io.BytesIO()
    np.save(buf, img)
    # bad matrix arity
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/warp?matrix=1,2,3&outSize=8x8", buf.getvalue())
    assert ei.value.code == 400
    # missing outSize
    mat = ",".join(str(v) for v in np.eye(3).ravel())
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{base}/v1/warp?matrix={mat}", buf.getvalue())
    assert ei.value.code == 400
    # wrong npy payload shape
    buf2 = io.BytesIO()
    np.save(buf2, np.zeros((8, 8), np.float32))
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/upscale?scale=2", buf2.getvalue())
    assert ei.value.code == 400
    # unknown route
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/nope", buf.getvalue())
    assert ei.value.code == 404


def test_malformed_bodies_return_400(served):
    """Garbage image/npy bytes are CLIENT errors: PIL's
    UnidentifiedImageError (an OSError) and np.load's ValueError must both
    surface as HTTP 400, never a dead handler thread and a dropped
    connection."""
    _, base = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/upscale?scale=2", b"\x89PNG but not really",
              ctype="image/png")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/upscale?scale=2", b"\x93NUMPY garbage here")
    assert ei.value.code == 400
    # the daemon still serves after the malformed bodies
    pred, _ = served
    img = np.random.RandomState(40).randint(
        0, 256, (*IN_SZ, 3), dtype=np.uint8)
    _, got = _post_npy(base + "/v1/upscale?scale=1.5x2.0", img)
    np.testing.assert_array_equal(got, pred.upscale_dynamic(img, 1.5, 2.0))


def test_oversized_body_413():
    """A Content-Length above the cap is rejected with 413 BEFORE the body
    is buffered, and the daemon keeps serving afterwards."""
    pred = _lut_predictor()
    server = make_server(pred, port=0, max_body_bytes=1024)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    big = np.zeros((64, 64, 3), np.uint8)           # ~12 KB as npy
    buf = io.BytesIO()
    np.save(buf, big)
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/v1/upscale?scale=2", buf.getvalue())
        assert ei.value.code == 413
        assert "limit" in json.loads(ei.value.read())["error"]
        # under-cap requests still serve
        small = np.random.RandomState(41).randint(
            0, 256, (8, 8, 3), dtype=np.uint8)
        _, got = _post_npy(base + "/v1/upscale?scale=2", small)
        np.testing.assert_array_equal(got, pred.upscale_dynamic(small, 2, 2))
    finally:
        server.shutdown()


def test_unexpected_error_500_keepalive_survives():
    """A failure outside the expected client-error set produces a JSON 500
    on the SAME keep-alive connection, and the connection remains usable
    for the next request (no dead thread, no drop)."""
    import http.client

    class Boom:
        """Delegates to a real predictor, detonates on scale_h == 7."""

        def __init__(self, inner):
            self._inner = inner

        def upscale_dynamic_async(self, img, sh, sw, granularity=0):
            if sh == 7:
                raise RuntimeError("synthetic device fault")
            return self._inner.upscale_dynamic_async(
                img, sh, sw, granularity=granularity)

        def upscale_dynamic(self, *a, **k):
            return self._inner.upscale_dynamic(*a, **k)

    inner = _lut_predictor()
    server = make_server(Boom(inner), port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    img = np.random.RandomState(42).randint(
        0, 256, (8, 8, 3), dtype=np.uint8)
    buf = io.BytesIO()
    np.save(buf, img)
    body = buf.getvalue()
    conn = http.client.HTTPConnection(
        "127.0.0.1", server.server_address[1], timeout=600)
    try:
        conn.request("POST", "/v1/upscale?scale=7", body,
                     {"Content-Type": "application/x-npy"})
        resp = conn.getresponse()
        assert resp.status == 500
        err = json.loads(resp.read())
        assert "RuntimeError" in err["error"]
        # same socket, next request succeeds
        conn.request("POST", "/v1/upscale?scale=2", body,
                     {"Content-Type": "application/x-npy"})
        resp = conn.getresponse()
        assert resp.status == 200
        got = np.load(io.BytesIO(resp.read()), allow_pickle=False)
        np.testing.assert_array_equal(got, inner.upscale_dynamic(img, 2, 2))
    finally:
        conn.close()
        server.shutdown()


def test_upscale_batch_npy_bit_exact(served):
    """The batched endpoint (one device program for the whole stack —
    the small-frame amortization path) is bit-exact to upscale_batch."""
    pred, base = served
    imgs = np.random.RandomState(50).randint(
        0, 256, (3, 24, 30, 3), dtype=np.uint8)
    buf = io.BytesIO()
    np.save(buf, imgs)
    resp = _post(base + "/v1/upscale_batch?scale=2", buf.getvalue())
    got = np.load(io.BytesIO(resp.read()), allow_pickle=False)
    np.testing.assert_array_equal(got, pred.upscale_batch(imgs, 2, 2))
    # wrong rank → 400
    buf2 = io.BytesIO()
    np.save(buf2, imgs[0])
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/upscale_batch?scale=2", buf2.getvalue())
    assert ei.value.code == 400


def test_warp_batch_npz_bit_exact(served):
    """Per-frame homographies through the batched endpoint equal
    warp_batch's {out, mask} pair."""
    pred, base = served
    rng = np.random.RandomState(51)
    imgs = rng.randint(0, 256, (2, 24, 30, 3), dtype=np.uint8)
    mats = np.stack([MAT, MAT + np.diag([0.05, -0.03, 0.0])])
    buf = io.BytesIO()
    np.savez(buf, imgs=imgs, matrices=mats)
    resp = _post(base + "/v1/warp_batch?outSize=20x26", buf.getvalue(),
                 ctype="application/x-npz")
    with np.load(io.BytesIO(resp.read()), allow_pickle=False) as pack:
        got_out, got_mask = pack["out"], pack["mask"]
    want_out, want_mask = pred.warp_batch(imgs, mats, (20, 26))
    np.testing.assert_array_equal(got_out, want_out)
    np.testing.assert_array_equal(got_mask, np.asarray(want_mask))


def test_warp_batch_matrices_mismatch_400(served):
    """A matrices batch that doesn't match imgs must be a 400 with an
    actionable message — not an IndexError 500 or silent truncation."""
    _, base = served
    rng = np.random.RandomState(52)
    imgs = rng.randint(0, 256, (2, 8, 10, 3), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez(buf, imgs=imgs, matrices=np.stack([np.eye(3)] * 5))
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/warp_batch?outSize=8x10", buf.getvalue(),
              ctype="application/x-npz")
    assert ei.value.code == 400
    assert "matrices" in json.loads(ei.value.read())["error"]


def test_batch_wrong_container_types_400(served):
    """Container-type confusion must be a 400, not a 500: an .npz body on
    the .npy endpoint (NpzFile has no .dtype) and a plain .npy body on the
    .npz endpoint (ndarray is not a context manager)."""
    _, base = served
    imgs = np.zeros((2, 8, 10, 3), np.uint8)
    npz = io.BytesIO()
    np.savez(npz, imgs=imgs, matrices=np.eye(3))
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/upscale_batch?scale=2", npz.getvalue())
    assert ei.value.code == 400
    assert "npy" in json.loads(ei.value.read())["error"]
    npy = io.BytesIO()
    np.save(npy, imgs)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/warp_batch?outSize=8x10", npy.getvalue(),
              ctype="application/x-npz")
    assert ei.value.code == 400
    assert "npz" in json.loads(ei.value.read())["error"]


def test_serve_cli_builds_daemon(tmp_path):
    """The CLI wires config → predictor → server without serving forever."""
    from lerf_tpu.cli import serve as serve_cli
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
    server = serve_cli.main(["-e", str(exp), "--port", "0", "--bucket",
                             "16", "--platform", "cpu"],
                            serve_forever=False)
    assert server.lerf_state.granularity == 16
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
        assert json.loads(resp.read())["granularity"] == 16
    server.shutdown()


def test_bad_geometry_rejected_at_startup():
    """A geometry typo ("devcie") must fail server construction loudly,
    not silently serve the host path."""
    with pytest.raises(ValueError, match="geometry"):
        make_server(_lut_predictor(), port=0, geometry="devcie")


def test_warp_device_geometry_daemon():
    """geometry="device" routes /v1/warp through warp_device_async (the
    in-program-geometry serving form) — npz response equals warp_device."""
    pred = _lut_predictor()
    server = make_server(pred, port=0, geometry="device")
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    img = np.random.RandomState(33).randint(
        0, 256, (*IN_SZ, 3), dtype=np.uint8)
    mat = ",".join(str(v) for v in MAT.ravel())
    buf = io.BytesIO()
    np.save(buf, img)
    try:
        resp = _post(f"{base}/v1/warp?matrix={mat}&outSize=20x26"
                     f"&format=npz", buf.getvalue())
        with np.load(io.BytesIO(resp.read()), allow_pickle=False) as z:
            got_out, got_mask = z["out"], z["mask"]
    finally:
        server.shutdown()
    want_out, want_mask = pred.warp_device(img, MAT, (20, 26))
    np.testing.assert_array_equal(got_out, want_out)
    np.testing.assert_array_equal(got_mask, np.asarray(want_mask))
