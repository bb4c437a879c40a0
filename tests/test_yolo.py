"""Person-detector NN (models/yolo.py) vs the reference's torch model.

The strongest possible architecture-parity evidence: the JAX functional
forward is fed the reference's OWN shipped checkpoint and compared
against the reference's OWN torch modules on the same input."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.models import yolo

REF = "/root/reference/onboard_detector/scripts/yolo_detector"
WEIGHT = os.path.join(REF, "weights", "weight_AP05:0.253207_280-epoch.pth")

try:
    import torch  # noqa: F401
    HAVE_TORCH = True
except Exception:      # pragma: no cover
    HAVE_TORCH = False

needs_ref = pytest.mark.skipif(
    not (HAVE_TORCH and os.path.exists(WEIGHT)),
    reason="torch or the reference checkpoint unavailable")


def _load_ref_model():
    import torch
    sys.path.insert(0, REF)
    from module.detector import Detector
    # load_param=True skips _initialize_weights' relative-path torch.load
    # (which newer torch's weights_only default rejects anyway); the real
    # checkpoint is loaded explicitly below
    model = Detector(80, True).float()
    sd = torch.load(WEIGHT, map_location="cpu", weights_only=True)
    model.load_state_dict(sd, strict=True)
    model.eval()
    return model, sd


@pytest.fixture(scope="module")
def ref_setup():
    if not (HAVE_TORCH and os.path.exists(WEIGHT)):
        pytest.skip("reference checkpoint unavailable")
    import torch
    # Detector(80, False) tries to torch.load a relative ./module path in
    # _initialize_weights; run with cwd at the reference dir
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        model, sd = _load_ref_model()
    finally:
        os.chdir(cwd)
    params = yolo.params_from_torch_state_dict(sd)
    return model, params


@needs_ref
def test_forward_parity_with_reference_weights(ref_setup):
    """JAX forward == torch forward on the reference's own checkpoint
    (random input image, full 352x352 resolution)."""
    import torch
    model, params = ref_setup
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 352, 352).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img)).numpy()
    ours = np.asarray(jax.jit(yolo.detector_forward)(params,
                                                     jnp.asarray(img)))
    assert ours.shape == ref.shape == (1, 85, 22, 22)
    err = np.abs(ours - ref).max()
    assert err < 2e-4, err


def _ref_grid_decode(preds_np):
    """Independent numpy transcription of handle_preds' grid decode
    (utils/tool.py:8-30, pre-NMS): score = obj^0.6 * clsmax^0.4, tanh
    center offsets over the cell grid, sigmoid extents."""
    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))
    p = np.transpose(preds_np, (1, 2, 0))
    H, W = p.shape[:2]
    pobj, preg, pcls = p[..., 0], p[..., 1:5], p[..., 5:]
    score = (pobj ** 0.6) * (pcls.max(-1) ** 0.4)
    cat = pcls.argmax(-1)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    bw, bh = sig(preg[..., 2]), sig(preg[..., 3])
    bcx = (np.tanh(preg[..., 0]) + gx) / W
    bcy = (np.tanh(preg[..., 1]) + gy) / H
    boxes = np.stack([bcx - bw / 2, bcy - bh / 2,
                      bcx + bw / 2, bcy + bh / 2], axis=-1)
    return boxes.reshape(-1, 4), score.reshape(-1), cat.reshape(-1)


@needs_ref
def test_decode_matches_reference_postprocess(ref_setup):
    """JAX fixed-shape decode == the handle_preds grid decode on real
    network output (pre-NMS boxes/scores/classes; NMS semantics pinned by
    test_decode_nms_suppresses_duplicates — the reference's
    torchvision.ops.batched_nms is not installable here)."""
    import torch
    model, params = ref_setup
    rng = np.random.RandomState(1)
    img = rng.rand(1, 3, 352, 352).astype(np.float32)
    with torch.no_grad():
        preds_t = model(torch.from_numpy(img)).numpy()[0]
    thresh = 0.02   # low threshold: untrained-score outputs are small
    boxes_r, score_r, cat_r = _ref_grid_decode(preds_t)
    keep = score_r > thresh
    order = np.argsort(-score_r[keep])
    det = yolo.decode(jnp.asarray(preds_t), conf_thresh=thresh,
                      nms_thresh=2.0, max_det=32)   # NMS disabled
    ours_v = np.asarray(det.valid)
    k = min(int(keep.sum()), 32)
    assert k > 0, "no detections above threshold - lower it"
    assert ours_v[:k].all()
    np.testing.assert_allclose(np.asarray(det.scores)[:k],
                               score_r[keep][order][:k], atol=1e-5)
    np.testing.assert_allclose(np.asarray(det.boxes)[:k],
                               boxes_r[keep][order][:k], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(det.classes)[:k],
                                  cat_r[keep][order][:k])


def test_person_rects_feed_fusion():
    """End-to-end into the round-2 fusion boundary: synthetic detections
    -> person_rects -> perception.fuse_external_2d marks the matching 3D
    box as human."""
    from intent_mpc_tpu.models import perception as pc

    det = yolo.Detections(
        boxes=jnp.asarray([[0.4, 0.4, 0.6, 0.8],
                           [0.1, 0.1, 0.2, 0.2]]),
        scores=jnp.asarray([0.9, 0.8]),
        classes=jnp.asarray([yolo.PERSON_CLASS, 7]),
        valid=jnp.asarray([True, True]))
    intr = pc.CameraIntrinsics(fx=100.0, fy=100.0, cx=50.0, cy=50.0)
    rects, ok = yolo.person_rects(det, 100, 100)
    assert bool(ok[0]) and not bool(ok[1])   # class filter works
    # a 3D box straight ahead that projects onto the person detection
    centers = jnp.asarray([[0.0, 0.2, 2.0], [5.0, 5.0, 2.0]])
    sizes = jnp.asarray([[0.4, 0.8, 0.4], [0.4, 0.4, 0.4]])
    valid = jnp.asarray([True, True])
    cam_pos = jnp.zeros(3)
    cam_rot = jnp.eye(3)
    dyn, human = pc.fuse_external_2d(intr, centers, sizes, valid, cam_pos,
                                     cam_rot, rects, ok, iou_thresh=0.2)
    assert bool(human[0])
    assert not bool(human[1])


def test_decode_nms_suppresses_duplicates():
    """Two near-identical boxes of the same class: greedy NMS keeps the
    higher-scored one; a different class at the same spot survives
    (batched_nms semantics)."""
    C = 8
    H = W = 4
    preds = np.zeros((5 + C, H, W), np.float32)
    # cell (1,1) and (1,2): same class 2, overlapping boxes
    for gx, obj in ((1, 0.9), (2, 0.8)):
        preds[0, 1, gx] = obj
        preds[1, 1, gx] = np.arctanh(np.clip(1.5 - gx, -0.99, 0.99))
        preds[2, 1, gx] = 0.0
        preds[3, 1, gx] = 2.0     # sigmoid -> wide box
        preds[4, 1, gx] = 2.0
        preds[5 + 2, 1, gx] = 8.0  # softmax peak on class 2
    # same location, different class
    preds[0, 2, 1] = 0.7
    preds[3, 2, 1] = 2.0
    preds[4, 2, 1] = 2.0
    preds[5 + 4, 2, 1] = 8.0
    det = yolo.decode(jnp.asarray(preds), conf_thresh=0.1, max_det=8)
    kept = np.asarray(det.valid)
    cls = np.asarray(det.classes)
    assert kept.sum() == 2
    assert set(cls[kept]) == {2, 4}
