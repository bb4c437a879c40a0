"""FastestDet-style person detector (the reference's YOLO helper) in JAX.

The reference runs a ShuffleNetV2-backbone anchor-free detector
(onboard_detector/scripts/yolo_detector/: module/shufflenetv2.py,
module/custom_layers.py, module/detector.py, utils/tool.py
handle_preds) on the color image and feeds the "person" boxes into the
dynamic detector's YOLO fusion branch. Round 2 ported the fusion
boundary (perception.fuse_external_2d); this module closes the last
partial inventory row with the NETWORK itself:

  * a pure-functional NCHW forward (`detector_forward`) mirroring the
    torch module tree exactly — ShuffleV2Block stages [4, 8, 4] with
    channels [24, 48, 96, 192], FPN-lite fusion (stage4 upsampled +
    stage2 avg-pooled + stage3, concat), SPP with 5x5 depthwise chains,
    and the obj/reg/cls DetectHead;
  * `params_from_torch_state_dict` converts the reference's own
    checkpoint layout (torch key names) into the param dict the forward
    consumes, so the ACTUAL pretrained weights load without torch at
    inference time (conversion needs torch once);
  * `decode` = utils/tool.py handle_preds as fixed-shape JAX: grid
    decode (tanh center offsets, sigmoid sizes), score =
    obj^0.6 * clsmax^0.4, confidence mask, top-k, and class-aware
    greedy NMS as a masked O(K^2) pass;
  * `person_rects` filters to one class id and emits [tlx, tly, w, h]
    image rectangles + a valid mask — exactly what
    perception.fuse_external_2d consumes.

Forward parity vs the reference's torch model with its shipped weights
is pinned by tests/test_yolo.py.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, jnp.ndarray]

STAGE_REPEATS = (4, 8, 4)
STAGE_OUT = (-1, 24, 48, 96, 192)
INPUT_SIZE = 352
PERSON_CLASS = 0          # coco.names line 0 = "person"


def _conv(p: Params, key: str, x, stride: int, pad: int, groups: int = 1):
    w = p[key + ".weight"]
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _bn(p: Params, key: str, x, eps: float = 1e-5):
    g = p[key + ".weight"][None, :, None, None]
    b = p[key + ".bias"][None, :, None, None]
    mu = p[key + ".running_mean"][None, :, None, None]
    var = p[key + ".running_var"][None, :, None, None]
    return g * (x - mu) * lax.rsqrt(var + eps) + b


def _cbr(p, prefix, idx_conv, idx_bn, x, stride=1, pad=0, groups=1,
         relu=True):
    x = _bn(p, f"{prefix}.{idx_bn}",
            _conv(p, f"{prefix}.{idx_conv}", x, stride, pad, groups))
    return jax.nn.relu(x) if relu else x


def _channel_shuffle(x):
    """ShuffleV2Block.channel_shuffle: torch reshape/permute transcribed
    row-major-exactly; returns the two half-channel tensors."""
    n, c, h, w = x.shape
    x = x.reshape(n * c // 2, 2, h * w)
    x = jnp.transpose(x, (1, 0, 2))
    x = x.reshape(2, n, c // 2, h, w)
    return x[0], x[1]


def _shuffle_block(p, prefix, x, inp, oup, mid, stride):
    """ShuffleV2Block forward (module/shufflenetv2.py:47-55)."""
    def main(t):
        t = _cbr(p, prefix + ".branch_main", 0, 1, t)               # pw
        t = _cbr(p, prefix + ".branch_main", 3, 4, t, stride=stride,
                 pad=1, groups=mid, relu=False)                     # dw
        t = _cbr(p, prefix + ".branch_main", 5, 6, t)               # pw
        return t

    if stride == 1:
        x_proj, x2 = _channel_shuffle(x)
        return jnp.concatenate([x_proj, main(x2)], axis=1)
    proj = _cbr(p, prefix + ".branch_proj", 0, 1, x, stride=2, pad=1,
                groups=inp, relu=False)
    proj = _cbr(p, prefix + ".branch_proj", 2, 3, proj)
    return jnp.concatenate([proj, main(x)], axis=1)


def _maxpool3s2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 3, 3),
                             (1, 1, 2, 2), [(0, 0), (0, 0), (1, 1), (1, 1)])


def _avgpool3s2(x):
    # torch AvgPool2d default count_include_pad=True: divisor is the
    # full window size, padded zeros included
    s = lax.reduce_window(x, 0.0, lax.add, (1, 1, 3, 3), (1, 1, 2, 2),
                          [(0, 0), (0, 0), (1, 1), (1, 1)])
    return s / 9.0


def _backbone(p: Params, x):
    x = _cbr(p, "backbone.first_conv", 0, 1, x, stride=2, pad=1)
    x = _maxpool3s2(x)
    outs = []
    inp = STAGE_OUT[1]
    for si, reps in enumerate(STAGE_REPEATS):
        oup = STAGE_OUT[si + 2]
        for i in range(reps):
            prefix = f"backbone.stage{si + 2}.{i}"
            if i == 0:
                x = _shuffle_block(p, prefix, x, inp, oup, oup // 2, 2)
            else:
                x = _shuffle_block(p, prefix, x, inp // 2, oup, oup // 2, 1)
            inp = oup
        outs.append(x)
    return outs                       # P1 (48), P2 (96), P3 (192)


def _spp(p: Params, x):
    x = _cbr(p, "SPP.Conv1x1.conv1x1", 0, 1, x)
    c = x.shape[1]
    y1 = _cbr(p, "SPP.S1", 0, 1, x, pad=2, groups=c)
    y2 = _cbr(p, "SPP.S2", 0, 1, x, pad=2, groups=c)
    y2 = _cbr(p, "SPP.S2", 3, 4, y2, pad=2, groups=c)
    y3 = _cbr(p, "SPP.S3", 0, 1, x, pad=2, groups=c)
    y3 = _cbr(p, "SPP.S3", 3, 4, y3, pad=2, groups=c)
    y3 = _cbr(p, "SPP.S3", 6, 7, y3, pad=2, groups=c)
    y = jnp.concatenate([y1, y2, y3], axis=1)
    y = _cbr(p, "SPP.output", 0, 1, y, relu=False)
    return jax.nn.relu(x + y)


def _head(p: Params, prefix, x):
    c = x.shape[1]
    x = _cbr(p, prefix + ".conv5x5", 0, 1, x, pad=2, groups=c)
    return _cbr(p, prefix + ".conv5x5", 3, 4, x, relu=False)


def detector_forward(p: Params, img: jnp.ndarray) -> jnp.ndarray:
    """img (N, 3, 352, 352) float in [0, 1] -> preds (N, 5 + C, 22, 22)
    (module/detector.py forward + DetectHead)."""
    P1, P2, P3 = _backbone(p, img)
    # nearest 2x upsample
    n, c, h, w = P3.shape
    P3 = jnp.repeat(jnp.repeat(P3, 2, axis=2), 2, axis=3)
    P1 = _avgpool3s2(P1)
    P = jnp.concatenate([P1, P2, P3], axis=1)
    y = _spp(p, P)
    y = _cbr(p, "detect_head.conv1x1.conv1x1", 0, 1, y)
    obj = jax.nn.sigmoid(_head(p, "detect_head.obj_layers", y))
    reg = _head(p, "detect_head.reg_layers", y)
    cls = jax.nn.softmax(_head(p, "detect_head.cls_layers", y), axis=1)
    return jnp.concatenate([obj, reg, cls], axis=1)


def params_from_torch_state_dict(sd) -> Params:
    """Convert the reference checkpoint (torch OrderedDict of tensors,
    e.g. weights/weight_AP05:0.253207_280-epoch.pth) to the param dict
    the functional forward consumes. Conv layouts are identical (OIHW);
    num_batches_tracked entries are dropped."""
    import numpy as np
    out = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = jnp.asarray(np.asarray(v.detach().cpu().numpy()
                                        if hasattr(v, "detach") else v))
    return out


class Detections(NamedTuple):
    boxes: jnp.ndarray     # (K, 4) [x1, y1, x2, y2], normalized [0, 1]
    scores: jnp.ndarray    # (K,)
    classes: jnp.ndarray   # (K,) int32
    valid: jnp.ndarray     # (K,) bool


def decode(preds: jnp.ndarray, conf_thresh: float = 0.65,
           nms_thresh: float = 0.45, max_det: int = 16) -> Detections:
    """handle_preds (utils/tool.py) as fixed-shape JAX for ONE image:
    preds (5+C, H, W) -> top-max_det class-aware-NMS detections."""
    C = preds.shape[0] - 5
    _, H, W = preds.shape
    pred = jnp.transpose(preds, (1, 2, 0))            # (H, W, 5+C)
    pobj = pred[..., 0]
    preg = pred[..., 1:5]
    pcls = pred[..., 5:]
    score = (pobj ** 0.6) * (jnp.max(pcls, axis=-1) ** 0.4)
    cat = jnp.argmax(pcls, axis=-1)
    gy, gx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    bw = jax.nn.sigmoid(preg[..., 2])
    bh = jax.nn.sigmoid(preg[..., 3])
    bcx = (jnp.tanh(preg[..., 0]) + gx) / W
    bcy = (jnp.tanh(preg[..., 1]) + gy) / H
    x1, y1 = bcx - 0.5 * bw, bcy - 0.5 * bh
    x2, y2 = bcx + 0.5 * bw, bcy + 0.5 * bh

    flat_score = jnp.where(score > conf_thresh, score, 0.0).reshape(-1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(-1, 4)
    cats = cat.reshape(-1)
    top_s, top_i = lax.top_k(flat_score, max_det)
    b = boxes[top_i]
    c = cats[top_i].astype(jnp.int32)
    alive = top_s > 0.0

    # class-aware greedy NMS (torchvision.ops.batched_nms): offset each
    # class into its own coordinate island, then plain greedy NMS over
    # the score-sorted top-k (top_k returns sorted)
    off = c.astype(jnp.float32)[:, None] * 10.0
    bb = b + off
    area = jnp.maximum(bb[:, 2] - bb[:, 0], 0) * \
        jnp.maximum(bb[:, 3] - bb[:, 1], 0)

    def body(keep, i):
        xx1 = jnp.maximum(bb[i, 0], bb[:, 0])
        yy1 = jnp.maximum(bb[i, 1], bb[:, 1])
        xx2 = jnp.minimum(bb[i, 2], bb[:, 2])
        yy2 = jnp.minimum(bb[i, 3], bb[:, 3])
        ov = jnp.maximum(xx2 - xx1, 0) * jnp.maximum(yy2 - yy1, 0)
        iou = ov / jnp.maximum(area[i] + area - ov, 1e-9)
        # i is suppressed if any HIGHER-scored kept box overlaps > thresh
        higher = jnp.arange(max_det) < i
        sup = jnp.any(higher & keep & (iou > nms_thresh))
        return keep.at[i].set(keep[i] & ~sup), None

    keep0 = alive
    keep, _ = lax.scan(body, keep0, jnp.arange(max_det))
    return Detections(boxes=b, scores=top_s, classes=c, valid=keep)


def person_rects(det: Detections, img_w: int, img_h: int,
                 person_class: int = PERSON_CLASS
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Filter to the person class and emit pixel-space [tlx, tly, w, h]
    rects + valid mask — the det2d stream perception.fuse_external_2d
    consumes (the reference's bbox_callback keeps target_classes ==
    ["person"], yolo_detector.py:72-86)."""
    ok = det.valid & (det.classes == person_class)
    scale = jnp.array([img_w, img_h, img_w, img_h], jnp.float32)
    bx = det.boxes * scale[None, :]
    rects = jnp.stack([bx[:, 0], bx[:, 1], bx[:, 2] - bx[:, 0],
                       bx[:, 3] - bx[:, 1]], axis=-1)
    return rects, ok
