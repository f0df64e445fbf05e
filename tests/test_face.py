"""Face-detection stack: MTCNN nets, cascade, heuristic fallback, and
the end-to-end `data.use_face_detection` wiring.

Parity target: the reference's optional MTCNN FaceDetector
(`src/image_dataset_loader.py:27-77`) — there the capability activates
by installing facenet-pytorch; here the nets ship in flax with a
facenet state_dict converter, plus a weights-free heuristic fallback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rare_disease_tpu.models.mtcnn import (
    MTCNNDetector,
    ONet,
    PNet,
    RNet,
    build_face_detector,
    convert_mtcnn,
    detect_faces,
    heuristic_face_box,
    init_mtcnn_params,
    load_mtcnn_npz,
    save_mtcnn_npz,
)


def _face_image(size=256, cy=110, cx=150, ry=60, rx=45, seed=0):
    """Portrait-style synthetic image: skin-tone ellipse ("face") with
    eye/mouth darkening on a dark uniform background."""
    rng = np.random.default_rng(seed)
    img = np.full((size, size, 3), 30, np.float32)
    img += rng.normal(0, 2, img.shape).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    ell = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    img[ell] = np.array([205.0, 160.0, 135.0])
    for ex in (cx - rx // 2, cx + rx // 2):
        eye = ((yy - (cy - ry // 4)) ** 2 + (xx - ex) ** 2) <= 36
        img[eye] = 40.0
    mouth = (np.abs(yy - (cy + ry // 2)) <= 3) & (np.abs(xx - cx) <= rx // 3)
    img[mouth] = 90.0
    return np.clip(img, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# net shape contracts
# ---------------------------------------------------------------------------


def test_pnet_fully_convolutional_map():
    p = PNet().init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    prob, reg = PNet().apply(p, jnp.zeros((2, 12, 12, 3)))
    assert prob.shape == (2, 1, 1, 2) and reg.shape == (2, 1, 1, 4)
    np.testing.assert_allclose(np.asarray(prob).sum(-1), 1.0, atol=1e-5)
    # stride-2 map on a larger input: out = (H-12)//2 + 1
    prob, reg = PNet().apply(p, jnp.zeros((1, 100, 60, 3)))
    assert prob.shape == (1, 45, 25, 2) and reg.shape == (1, 45, 25, 4)


def test_rnet_onet_shapes():
    r = RNet().init(jax.random.key(0), jnp.zeros((1, 24, 24, 3)))
    prob, reg = RNet().apply(r, jnp.zeros((3, 24, 24, 3)))
    assert prob.shape == (3, 2) and reg.shape == (3, 4)
    o = ONet().init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)))
    prob, reg, lmk = ONet().apply(o, jnp.zeros((3, 48, 48, 3)))
    assert prob.shape == (3, 2) and reg.shape == (3, 4)
    assert lmk.shape == (3, 10)


# ---------------------------------------------------------------------------
# facenet-pytorch state_dict conversion
# ---------------------------------------------------------------------------


def _fake_state_dicts(rng):
    def conv(ci, co, k):
        return rng.normal(0, 0.1, (co, ci, k, k)).astype(np.float32)

    def lin(ci, co):
        return rng.normal(0, 0.1, (co, ci)).astype(np.float32)

    def pre(c):
        return rng.uniform(0.1, 0.4, (c, 1, 1)).astype(np.float32)

    b = lambda c: rng.normal(0, 0.01, (c,)).astype(np.float32)  # noqa: E731
    pnet = {
        "conv1.weight": conv(3, 10, 3), "conv1.bias": b(10),
        "prelu1.weight": pre(10),
        "conv2.weight": conv(10, 16, 3), "conv2.bias": b(16),
        "prelu2.weight": pre(16),
        "conv3.weight": conv(16, 32, 3), "conv3.bias": b(32),
        "prelu3.weight": pre(32),
        "conv4_1.weight": conv(32, 2, 1), "conv4_1.bias": b(2),
        "conv4_2.weight": conv(32, 4, 1), "conv4_2.bias": b(4),
    }
    rnet = {
        "conv1.weight": conv(3, 28, 3), "conv1.bias": b(28),
        "prelu1.weight": pre(28),
        "conv2.weight": conv(28, 48, 3), "conv2.bias": b(48),
        "prelu2.weight": pre(48),
        "conv3.weight": conv(48, 64, 2), "conv3.bias": b(64),
        "prelu3.weight": pre(64),
        "dense4.weight": lin(576, 128), "dense4.bias": b(128),
        "prelu4.weight": pre(128),
        "dense5_1.weight": lin(128, 2), "dense5_1.bias": b(2),
        "dense5_2.weight": lin(128, 4), "dense5_2.bias": b(4),
    }
    onet = {
        "conv1.weight": conv(3, 32, 3), "conv1.bias": b(32),
        "prelu1.weight": pre(32),
        "conv2.weight": conv(32, 64, 3), "conv2.bias": b(64),
        "prelu2.weight": pre(64),
        "conv3.weight": conv(64, 64, 3), "conv3.bias": b(64),
        "prelu3.weight": pre(64),
        "conv4.weight": conv(64, 128, 2), "conv4.bias": b(128),
        "prelu4.weight": pre(128),
        "dense5.weight": lin(1152, 256), "dense5.bias": b(256),
        "prelu5.weight": pre(256),
        "dense6_1.weight": lin(256, 2), "dense6_1.bias": b(2),
        "dense6_2.weight": lin(256, 4), "dense6_2.bias": b(4),
        "dense6_3.weight": lin(256, 10), "dense6_3.bias": b(10),
    }
    return pnet, rnet, onet


def test_convert_mtcnn_matches_init_tree():
    rng = np.random.default_rng(0)
    params = convert_mtcnn(*_fake_state_dicts(rng))
    ref = init_mtcnn_params(jax.random.key(0))
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    want_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    assert got_shapes == want_shapes
    # converted nets must run
    prob, reg = PNet().apply({"params": params["pnet"]},
                             jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(prob)).all()


def test_mtcnn_npz_roundtrip(tmp_path):
    params = init_mtcnn_params(jax.random.key(1))
    path = str(tmp_path / "mtcnn.npz")
    save_mtcnn_npz(params, path)
    loaded = load_mtcnn_npz(path)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_convert_mtcnn_dense_unpermute_parity():
    """The (N,W,H,C)-flatten quirk: our RNet forward on converted
    weights must equal a direct numpy emulation of facenet's RNet
    (NCHW convs + permute(0,3,2,1) flatten) on the same input."""
    rng = np.random.default_rng(3)
    pnet_sd, rnet_sd, onet_sd = _fake_state_dicts(rng)
    params = convert_mtcnn(pnet_sd, rnet_sd, onet_sd)
    x = rng.normal(0, 1, (2, 24, 24, 3)).astype(np.float32)

    # numpy reference of facenet RNet in NCHW
    def conv_nchw(x, w, b, stride=1):
        co, ci, kh, kw = w.shape
        n, c, h, wd = x.shape
        oh, ow = (h - kh) // stride + 1, (wd - kw) // stride + 1
        out = np.zeros((n, co, oh, ow), np.float32)
        for i in range(oh):
            for j in range(ow):
                patch = x[:, :, i * stride:i * stride + kh,
                          j * stride:j * stride + kw]
                out[:, :, i, j] = patch.reshape(n, -1) @ \
                    w.reshape(co, -1).T
        return out + b[None, :, None, None]

    def prelu(x, a):
        a = a.reshape(1, -1, 1, 1) if x.ndim == 4 else a.reshape(1, -1)
        return np.maximum(x, 0) + a * np.minimum(x, 0)

    def pool_ceil(x, k, s):
        n, c, h, w = x.shape
        oh = -(-(h - k) // s) + 1
        ow = -(-(w - k) // s) + 1
        out = np.full((n, c, oh, ow), -np.inf, np.float32)
        for i in range(oh):
            for j in range(ow):
                out[:, :, i, j] = x[:, :, i * s:i * s + k,
                                    j * s:j * s + k].max(axis=(2, 3))
        return out

    t = x.transpose(0, 3, 1, 2)  # NHWC -> NCHW
    t = prelu(conv_nchw(t, rnet_sd["conv1.weight"],
                        rnet_sd["conv1.bias"]),
              rnet_sd["prelu1.weight"].reshape(-1))
    t = pool_ceil(t, 3, 2)
    t = prelu(conv_nchw(t, rnet_sd["conv2.weight"],
                        rnet_sd["conv2.bias"]),
              rnet_sd["prelu2.weight"].reshape(-1))
    t = pool_ceil(t, 3, 2)
    t = prelu(conv_nchw(t, rnet_sd["conv3.weight"],
                        rnet_sd["conv3.bias"]),
              rnet_sd["prelu3.weight"].reshape(-1))
    t = t.transpose(0, 3, 2, 1).reshape(t.shape[0], -1)  # facenet permute
    t = prelu(t @ rnet_sd["dense4.weight"].T + rnet_sd["dense4.bias"],
              rnet_sd["prelu4.weight"].reshape(-1))
    want_reg = t @ rnet_sd["dense5_2.weight"].T + rnet_sd["dense5_2.bias"]

    _, got_reg = RNet().apply({"params": params["rnet"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_reg), want_reg,
                               atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# cascade + heuristic + hook wiring
# ---------------------------------------------------------------------------


def test_detect_faces_runs_with_random_weights():
    params = init_mtcnn_params(jax.random.key(0))
    boxes, probs = detect_faces(params, _face_image(128),
                                min_face_size=40)
    assert boxes.shape[1:] == (4,) if len(boxes) else True
    assert len(boxes) == len(probs)
    det = MTCNNDetector(params)
    out = det(_face_image(128))
    assert out is None or (len(out) == 4 and all(v >= 0 for v in out))


def test_heuristic_face_box_finds_offcenter_face():
    img = _face_image()
    box = heuristic_face_box(img)
    assert box is not None
    top, left, h, w = box
    # must tightly cover the ellipse at (cy=110, cx=150, ry=60, rx=45)
    assert abs(top - 50) <= 8 and abs(left - 105) <= 8
    assert abs(h - 120) <= 16 and abs(w - 90) <= 16


def test_heuristic_face_box_none_on_uniform_image():
    img = np.full((128, 128, 3), 77, np.uint8)
    assert heuristic_face_box(img) is None


def test_build_face_detector_fallbacks(tmp_path):
    assert build_face_detector("heuristic") is heuristic_face_box
    assert build_face_detector("auto", "") is heuristic_face_box
    with pytest.raises(FileNotFoundError):
        build_face_detector("mtcnn", str(tmp_path / "missing.npz"))
    path = str(tmp_path / "w.npz")
    save_mtcnn_npz(init_mtcnn_params(jax.random.key(0)), path)
    det = build_face_detector("auto", path)
    assert isinstance(det, MTCNNDetector)


def test_use_face_detection_changes_crops_end_to_end(tmp_path):
    """VERDICT round-2 done-criterion: the config flag changes the
    decoded corpus (face-centered crops vs full-frame resize)."""
    from PIL import Image

    from multimodal_rare_disease_tpu.config import resolve_config
    from multimodal_rare_disease_tpu.data.images import (
        configure_face_detection, load_image_uint8, set_face_detector)

    p = tmp_path / "SYN_KS_001.png"
    Image.fromarray(_face_image()).save(p)

    cfg_off = resolve_config("multimodal")
    configure_face_detection(cfg_off)
    plain = load_image_uint8(str(p), 224)

    cfg_on = resolve_config(
        "multimodal", overrides={"data.use_face_detection": True,
                                 "data.face_detector": "heuristic"})
    configure_face_detection(cfg_on)
    cropped = load_image_uint8(str(p), 224)
    set_face_detector(None)

    assert plain.shape == cropped.shape == (224, 224, 3)
    assert np.abs(plain.astype(np.int32)
                  - cropped.astype(np.int32)).mean() > 5
    # the face fills more of the frame after cropping: the skin-tone
    # fraction must rise
    skin = lambda a: ((a[..., 0] > 150) & (a[..., 2] < 180)).mean()  # noqa: E731
    assert skin(cropped) > skin(plain) * 1.5
