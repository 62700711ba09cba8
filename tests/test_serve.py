"""End-to-end test of the HTTP serving surface (cli/serve.py): start the
real ThreadingHTTPServer in-process with micro models on CPU, drive it
through http.client exactly as a deployment client would, and check the
health endpoint, mp4/json responses, input validation, and the
one-request-at-a-time chip lock's counter."""

import base64
import http.client
import io
import json
import threading

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _b64_png(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from stableanimator_tpu.cli.serve import (
        AnimationService,
        make_handler,
        parse_args,
    )

    ckpt = tmp_path_factory.mktemp("ckpt")
    args = parse_args([
        "--checkpoint_dir", str(ckpt), "--allow_random_init",
        "--model_scale", "micro", "--height", "64", "--width", "64",
        "--num_inference_steps", "2", "--tile_size", "4",
        "--frames_overlap", "1", "--decode_chunk_size", "2",
        "--port", "0"])
    service = AnimationService(args)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address
    httpd.shutdown()


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=600)
    headers = {"Content-Type": "application/json"} if body else {}
    conn.request(method, path,
                 body=json.dumps(body) if body else None, headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def test_healthz(server):
    status, ctype, data = _request(server, "GET", "/healthz")
    assert status == 200 and ctype == "application/json"
    rec = json.loads(data)
    assert rec["ok"] and "device" in rec


def test_animate_mp4_and_json(server):
    rng = np.random.default_rng(0)
    ref = _b64_png(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    poses = []
    for i in range(4):
        img = np.zeros((64, 64, 3), np.uint8)
        img[10 + i * 5:30 + i * 5, 20:40] = 255
        poses.append(_b64_png(img))

    status, ctype, data = _request(server, "POST", "/animate",
                                   {"reference": ref, "poses": poses})
    assert status == 200, data[:300]
    assert ctype == "video/mp4"
    assert len(data) > 200 and b"ftyp" in data[:64]  # mp4 container magic

    # same shape -> compiled graph is reused; json format variant
    status, ctype, data = _request(server, "POST", "/animate",
                                   {"reference": ref, "poses": poses,
                                    "format": "json", "seed": 7})
    assert status == 200 and ctype == "application/json"
    rec = json.loads(data)
    assert rec["frames"] == 4
    assert len(base64.b64decode(rec["mp4"])) > 200

    status, _, data = _request(server, "GET", "/healthz")
    assert json.loads(data)["requests_served"] == 2


def test_animate_validation_errors(server):
    status, _, data = _request(server, "POST", "/animate", {"poses": []})
    assert status == 400 and b"reference" in data
    status, _, data = _request(server, "POST", "/animate",
                               {"reference": "x", "poses": ["y"],
                                "height": 100})
    assert status == 400 and b"multiples of 64" in data
    status, _, _ = _request(server, "GET", "/nope")
    assert status == 404


def test_hardening_rejections(server):
    """Compile-DoS guards: oversized bodies die before the read, unknown
    shapes and compile-affecting overrides die before the chip lock, and
    the server keeps serving afterwards."""
    rng = np.random.default_rng(1)
    ref = _b64_png(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    pose = _b64_png(np.zeros((64, 64, 3), np.uint8))

    # 1. oversized body -> 413 without reading it (Content-Length gate)
    conn = http.client.HTTPConnection(*server, timeout=60)
    conn.putrequest("POST", "/animate")
    conn.putheader("Content-Type", "application/json")
    conn.putheader("Content-Length", str(10**12))  # claim a 1 TB body
    conn.endheaders()
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    assert resp.status == 413 and b"max_request_mb" in body

    # 2. shape outside the allowlist -> 400, no compile attempted
    status, _, data = _request(server, "POST", "/animate",
                               {"reference": ref, "poses": [pose],
                                "height": 128, "width": 128})
    assert status == 400 and b"allowlist" in data

    # 3. compile-affecting override -> 400 unless --allow_shape_overrides
    status, _, data = _request(server, "POST", "/animate",
                               {"reference": ref, "poses": [pose],
                                "num_inference_steps": 50})
    assert status == 400 and b"num_inference_steps" in data
    status, _, data = _request(server, "POST", "/animate",
                               {"reference": ref, "poses": [pose],
                                "guidance_scale": 9.5})
    assert status == 400 and b"guidance_scale" in data

    # 4. too many frames -> 413 (server fixture runs with default cap;
    #    craft a tiny-cap check through the service object instead of
    #    shipping 900 images through HTTP)
    # 5. the chip lock is untouched: a normal request still succeeds
    status, ctype, data = _request(server, "POST", "/animate",
                                   {"reference": ref, "poses": [pose] * 4,
                                    "seed": 3})
    assert status == 200 and ctype == "video/mp4"


def test_max_frames_cap():
    """The frames cap raises 413 from the REAL animate() before any model
    or decode work — exercised with a stand-in self (no models built)."""
    from stableanimator_tpu.cli.serve import (
        AnimationService,
        RequestRejected,
        _parse_buckets,
        parse_args,
    )

    args = parse_args(["--checkpoint_dir", "/tmp", "--max_frames", "8",
                       "--height", "64", "--width", "64"])

    class _Svc:
        pass

    svc = _Svc()
    svc.args = args
    svc.shape_buckets = _parse_buckets(args)
    with pytest.raises(RequestRejected) as exc:
        AnimationService.animate(svc, {"reference": "x", "poses": ["y"] * 9})
    assert exc.value.status == 413 and "max_frames" in str(exc.value)


def test_shape_buckets_parsing():
    from stableanimator_tpu.cli.serve import _parse_buckets, parse_args

    args = parse_args(["--checkpoint_dir", "/tmp", "--height", "512",
                       "--width", "512",
                       "--shape_buckets", "576x1024, 512X512"])
    assert _parse_buckets(args) == {(512, 512), (576, 1024)}
