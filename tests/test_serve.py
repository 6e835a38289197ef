"""Warm-pipeline edit server: the HTTP surface end-to-end on the tiny model
(health, maskless + bbox-masked edits, inversion, error handling)."""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from loco_edit_tpu.cli.args import parse_args, preset
    from loco_edit_tpu.serve import EditService, make_server

    root = str(tmp_path_factory.mktemp("serve"))
    args = preset(parse_args([
        "--model_name", "TinyTest", "--dataset_name", "Random",
        "--for_steps", "8", "--inv_steps", "8", "--edit_t", "0.6",
        "--performance_boosting_t", "0.2", "--x_space_guidance_scale", "0.5",
        "--x_space_guidance_num_step", "2", "--pca_rank", "1",
        "--pca_rank_null", "1", "--vis_num", "1",
        "--null_space_projection", "true",
        "--result_folder", root, "--seed", "11"]))
    service = EditService(args)
    service.pipe.cfg.save_images = False
    service.pipe.cfg.min_iter, service.pipe.cfg.max_iter = 1, 2
    srv = make_server(service, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", service
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, json.loads(r.read())


def test_health_and_edit_roundtrip(server):
    base, service = server
    with urllib.request.urlopen(base + "/health", timeout=30) as r:
        assert json.loads(r.read())["ok"]

    status, out = _post(base + "/edit", {"seed": 3, "sample_name": "s0"})
    assert status == 200
    import base64

    # serve default is the on-device uint8 PNG payload (pixel=True);
    # "pixel": false opts into the library API's raw float strips
    assert out["dtype"] == "uint8"
    strip = np.frombuffer(base64.b64decode(out["strips"]["0"]),
                          np.uint8).reshape(out["shape"])
    assert strip.shape[1:] == (32, 32, 3)
    assert out["secs"] > 0

    # masked edit with null-space projection through the bbox
    status, out2 = _post(base + "/edit", {
        "seed": 4, "mask_bbox": [8, 20, 8, 20], "sample_name": "s1"})
    assert status == 200 and out2["strips"]
    assert service.edits_served >= 2


def test_distinct_requests_do_not_share_basis_cache(server):
    """Two /edit requests with different seeds and no sample_name must get
    independent bases: the default disk-cache key is derived from the request
    content (a fixed default name would silently reuse request 1's
    directions for request 2)."""
    import base64

    base, _ = server
    _, o1 = _post(base + "/edit", {"seed": 21, "pixel": False})
    _, o2 = _post(base + "/edit", {"seed": 22, "pixel": False})
    s1 = np.frombuffer(base64.b64decode(o1["strips"]["0"]), np.float32)
    s2 = np.frombuffer(base64.b64decode(o2["strips"]["0"]), np.float32)
    assert not np.allclose(s1, s2)


def test_edit_honors_requested_pca_rank(server):
    base, service = server
    _, out = _post(base + "/edit", {"seed": 31, "pca_rank": 2})
    assert len(out["strips"]) == 2  # one strip per principal component
    assert service.pipe.cfg.pca_rank == 1  # server default restored


def test_invert_refine_steps_override(server):
    """/invert honors a per-request fixed-point refinement depth and
    restores the server default afterwards."""
    import base64

    base, service = server
    img = np.random.default_rng(13).uniform(
        -1, 1, (1, 32, 32, 3)).astype(np.float32)
    payload = base64.b64encode(img.tobytes()).decode()
    _, o0 = _post(base + "/invert", {"image": payload})
    _, o2 = _post(base + "/invert", {"image": payload, "refine_steps": 2})
    x0 = np.frombuffer(base64.b64decode(o0["xT"]), np.float32)
    x2 = np.frombuffer(base64.b64decode(o2["xT"]), np.float32)
    assert not np.allclose(x0, x2)  # refinement changes the inverse
    assert service.pipe.cfg.inv_refine_steps == 0  # default restored


def test_invert_endpoint_and_errors(server):
    base, _ = server
    import base64

    img = (np.random.default_rng(0).normal(size=(1, 32, 32, 3))
           .astype(np.float32) * 0.3)
    status, out = _post(base + "/invert", {
        "image": base64.b64encode(img.tobytes()).decode()})
    assert status == 200 and out["shape"] == [1, 32, 32, 3]

    # malformed request -> 500 with an error message, server keeps serving
    try:
        status, out = _post(base + "/invert", {"image": "not-base64!!"})
    except urllib.error.HTTPError as e:
        assert e.code == 500
    with urllib.request.urlopen(base + "/health", timeout=30) as r:
        assert json.loads(r.read())["ok"]


def test_segment_endpoint_all_tpu_sam(server, tmp_path):
    """/segment serves warm all-Flax SAM mask proposals; the converted
    bundle is cached on the service across requests."""
    import base64

    base, service = server
    from tests.test_sam_decoder_flax import _tiny_torch_sam

    _, _, model = _tiny_torch_sam()
    mdir = tmp_path / "tiny-sam"
    model.save_pretrained(mdir)
    service._args.mask_model_name = str(mdir)

    img = np.random.default_rng(9).uniform(
        -1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    payload = base64.b64encode(img.tobytes()).decode()
    status, out = _post(base + "/segment", {
        "image": payload, "filter_mask": 0, "points_per_side": 4})
    assert status == 200
    masks = np.frombuffer(base64.b64decode(out["masks"]),
                          np.uint8).reshape(out["shape"]).astype(bool)
    assert masks.ndim == 3 and masks.shape[1:] == (32, 32)
    assert service._sam is not None  # bundle cached for the next request

    status2, out2 = _post(base + "/segment", {
        "image": payload, "filter_mask": 0, "points_per_side": 4})
    assert status2 == 200 and out2["shape"] == out["shape"]


def test_edit_batch_matches_single(server):
    """/edit_batch runs N items through the batched pipeline; a maskless
    item in the batch must reproduce the single maskless /edit to fp
    tolerance (same seed, same unprojected-basis fallback, same boost noise
    stream after a counter reset; the batched forward runs at batch 2, so
    XLA may reassociate reductions — measured drift ~5e-6 relative), and
    distinct items must get distinct strips."""
    import base64

    base, service = server
    # fresh boost-tail noise stream for both runs (cross-call comparisons
    # need the per-call counter pinned — see test_edit_pixel_option)
    service.pipe._boost_calls = 0
    _, single = _post(base + "/edit", {"seed": 61, "sample_name": "b-ref61",
                                       "pixel": False})
    service.pipe._boost_calls = 0
    status, out = _post(base + "/edit_batch", {"items": [
        {"seed": 61}, {"seed": 62, "mask_bbox": [8, 20, 8, 20]}],
        "pixel": False})
    assert status == 200 and len(out["results"]) == 2 and out["secs"] > 0
    r0, r1 = out["results"]
    b0 = np.frombuffer(base64.b64decode(r0["strips"]["0"]), np.float32)
    s0 = np.frombuffer(base64.b64decode(single["strips"]["0"]), np.float32)
    scale = np.max(np.abs(s0))
    np.testing.assert_allclose(b0, s0, atol=3e-5 * max(scale, 1.0))
    b1 = np.frombuffer(base64.b64decode(r1["strips"]["0"]), np.float32)
    assert not np.allclose(b0, b1)
    assert service.pipe.cfg.null_space_projection  # server default restored


def test_edit_batch_rejects_bad_items(server):
    base, _ = server
    for bad in ({"items": []}, {"items": "nope"}, {}):
        try:
            status, _ = _post(base + "/edit_batch", bad)
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 500


def test_edit_pixel_option_returns_uint8(server):
    """"pixel": true returns the strips as on-device-converted uint8 pixels
    (dtype advertised in the response, payload 4x smaller), equal to the
    host to_uint8 of the float response for the same request."""
    from loco_edit_tpu.utils.io import to_uint8

    base, _service = server
    req = {"seed": 41, "sample_name": "px", "mask_bbox": [8, 20, 8, 20]}
    # identical boost-tail noise for both requests (the eta=1 tail draws a
    # fresh stream per call; the basis itself is disk-cached by sample_name)
    _service.pipe._boost_calls = 0
    _, out_f = _post(base + "/edit", dict(req, pixel=False))
    _service.pipe._boost_calls = 0
    _, out_u = _post(base + "/edit", dict(req, pixel=True))
    assert out_f["dtype"] == "float32" and out_u["dtype"] == "uint8"
    shape = tuple(out_u["shape"])
    for pc, b in out_u["strips"].items():
        got = np.frombuffer(
            __import__("base64").b64decode(b), np.uint8).reshape(shape)
        ref = np.frombuffer(
            __import__("base64").b64decode(out_f["strips"][pc]),
            np.float32).reshape(shape)
        np.testing.assert_array_equal(got, to_uint8(ref))
