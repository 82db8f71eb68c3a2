"""Detection stack tests: anchors, YOLO3D, CIoU, NMS, mAP round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adell_mri_tpu.models.detection import (
    CoarseDetector3d,
    YOLONet3d,
    anchor_targets_to_boxes,
    box_iou,
    boxes_to_anchor_targets,
    complete_iou_loss,
    mean_average_precision,
    nms_3d,
    yolo_loss,
)

KEY = jax.random.PRNGKey(0)
ANCHORS = np.asarray([[6.0, 6.0, 4.0], [12.0, 12.0, 6.0]], np.float32)


def test_anchor_roundtrip():
    boxes = np.asarray([[4.0, 4.0, 2.0, 10.0, 10.0, 6.0]])
    classes = np.asarray([1])
    obj, ctr, sz, cls = boxes_to_anchor_targets(
        boxes, classes, grid_shape=(8, 8, 4), anchors=ANCHORS,
        input_shape=(32, 32, 16),
    )
    assert obj.sum() == 1
    rec_boxes, scores = anchor_targets_to_boxes(
        obj, ctr, sz, ANCHORS, input_shape=(32, 32, 16), threshold=0.5
    )
    assert len(rec_boxes) == 1
    np.testing.assert_allclose(rec_boxes[0], boxes[0], atol=1.0)


def test_ciou_loss_properties():
    a = jnp.asarray([[0.0, 0, 0, 4, 4, 4]])
    assert float(complete_iou_loss(a, a)[0]) == pytest.approx(0.0, abs=1e-5)
    far = jnp.asarray([[10.0, 10, 10, 14, 14, 14]])
    assert float(complete_iou_loss(a, far)[0]) > 1.0


def test_box_iou_and_nms():
    boxes = np.asarray(
        [
            [0, 0, 0, 4, 4, 4],
            [1, 1, 1, 5, 5, 5],  # overlaps first
            [10, 10, 10, 14, 14, 14],
        ],
        np.float32,
    )
    scores = np.asarray([0.9, 0.8, 0.7])
    iou = box_iou(boxes, boxes)
    assert iou[0, 0] == pytest.approx(1.0)
    kept, ks, idx = nms_3d(boxes, scores, iou_threshold=0.2)
    assert len(kept) == 2
    assert ks[0] == pytest.approx(0.9)


def test_map_perfect_and_empty():
    gt = [np.asarray([[0, 0, 0, 4, 4, 4]])]
    pred = [np.asarray([[0.1, 0, 0, 4, 4, 4]])]
    scores = [np.asarray([0.9])]
    assert mean_average_precision(pred, scores, gt) > 0.9
    assert mean_average_precision(
        [np.zeros((0, 6))], [np.zeros(0)], gt
    ) == pytest.approx(0.0) or np.isnan(
        mean_average_precision([np.zeros((0, 6))], [np.zeros(0)], gt)
    )


def test_yolo_forward_and_loss():
    model = YOLONet3d(
        n_anchors=2,
        backbone_structure=[(8, 8, 3, 1)],
        norm_type="instance",
    )
    x = jnp.ones((2, 16, 16, 8, 1))
    v = model.init({"params": KEY}, x)
    preds = model.apply(v, x)
    grid = preds["objectness"].shape[1:-1]
    assert preds["objectness"].shape[-1] == 2
    assert preds["center_offsets"].shape[-1] == 6
    # build matching targets and take a grad step
    obj, ctr, sz, cls = boxes_to_anchor_targets(
        np.asarray([[2.0, 2, 1, 8, 8, 5]]),
        np.asarray([1]),
        grid_shape=grid,
        anchors=ANCHORS,
        input_shape=(16, 16, 8),
    )

    def to_cl(arr):  # channels-first (A,...) -> channels-last batch of 2
        moved = np.moveaxis(arr, 0, -1)
        return jnp.asarray(np.stack([moved, moved]))

    targets = {
        "objectness": to_cl(obj),
        "center_offsets": to_cl(ctr),
        "sizes": to_cl(sz),
        "classes": to_cl(cls),
    }
    total, comp = yolo_loss(preds, targets)
    assert np.isfinite(float(total))
    g = jax.grad(
        lambda p: yolo_loss(model.apply(p, x), targets)[0]
    )(v)
    flat = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)


def test_coarse_detector():
    m = CoarseDetector3d(
        backbone_structure=[(8, 8, 3, 1)], norm_type="instance"
    )
    x = jnp.ones((1, 16, 16, 8, 1))
    v = m.init({"params": KEY}, x)
    out = m.apply(v, x)
    assert out.shape[-1] == 1


def test_detection_transforms_flip_consistency():
    """Image and anchor targets must flip together (DetectionTransforms)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adell_mri_tpu.transforms import AugmentPolicy
    from adell_mri_tpu.transforms.pipeline import DetectionTransforms

    rng = np.random.default_rng(0)
    B, G, A, ndim = 4, (6, 6, 4), 2, 3
    image = jnp.asarray(rng.normal(size=(B, 12, 12, 8, 1)), jnp.float32)
    obj = jnp.asarray((rng.uniform(size=(B,) + G + (A,)) > 0.9), jnp.float32)
    ctr = jnp.asarray(rng.uniform(size=(B,) + G + (A * ndim,)), jnp.float32)
    sz = jnp.asarray(rng.normal(size=(B,) + G + (A * ndim,)), jnp.float32)
    cls = jnp.asarray(rng.uniform(size=(B,) + G + (1,)), jnp.float32)
    batch = {
        "image": image, "objectness": obj, "center_offsets": ctr,
        "sizes": sz, "classes": cls,
    }
    t = DetectionTransforms(
        augmentations=AugmentPolicy(
            flip=True, intensity=False, noise=False, affine=False
        )
    )
    out = t.augment(jax.random.PRNGKey(3), batch)
    for b in range(B):
        # infer which axes flipped from the image, then check the targets
        for d in range(ndim):
            flipped = bool(
                np.allclose(
                    np.asarray(out["image"][b]),
                    np.asarray(jnp.flip(image[b], axis=d)),
                )
            ) and not np.allclose(np.asarray(image[b]), np.asarray(jnp.flip(image[b], axis=d)))
            if flipped:
                np.testing.assert_allclose(
                    np.asarray(out["objectness"][b]),
                    np.asarray(jnp.flip(obj[b], axis=d)),
                )
                # mirrored offsets where boxes live, on the flipped axis
                of = np.asarray(jnp.flip(ctr[b], axis=d))
                oo = np.asarray(jnp.flip(obj[b], axis=d))
                exp = of.copy()
                for a in range(A):
                    ch = a * ndim + d
                    exp[..., ch] = np.where(
                        oo[..., a] > 0, 1.0 - of[..., ch], of[..., ch]
                    )
                np.testing.assert_allclose(
                    np.asarray(out["center_offsets"][b]), exp, atol=1e-6
                )


def test_boxes_to_anchor_targets_jax_matches_host():
    """On-device rasterizer == host rasterizer (channels-last layout)."""
    from adell_mri_tpu.models.detection import boxes_to_anchor_targets_jax

    boxes = np.asarray(
        [[4.0, 4.0, 2.0, 10.0, 10.0, 6.0], [16.0, 8.0, 4.0, 28.0, 20.0, 10.0]],
        np.float32,
    )
    classes = np.asarray([1.0, 1.0], np.float32)
    grid, inp = (8, 8, 4), (32, 32, 16)
    obj_h, ctr_h, sz_h, cls_h = boxes_to_anchor_targets(
        boxes, classes, grid, ANCHORS, inp
    )
    # pad and rasterize on device
    M = 5
    bp = np.zeros((M, 6), np.float32)
    cp = np.zeros((M,), np.float32)
    bp[:2], cp[:2] = boxes, classes
    valid = jnp.arange(M) < 2
    obj, ctr, sz, cls = jax.jit(
        lambda b, c, v: boxes_to_anchor_targets_jax(
            b, c, v, grid, ANCHORS, inp
        )
    )(jnp.asarray(bp), jnp.asarray(cp), valid)
    np.testing.assert_allclose(np.asarray(obj), np.moveaxis(obj_h, 0, -1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ctr), np.moveaxis(ctr_h, 0, -1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sz), np.moveaxis(sz_h, 0, -1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls), np.moveaxis(cls_h, 0, -1), atol=1e-6)


def test_transform_boxes_affine_follows_content():
    """A bright blob inside a box stays inside the transformed box after a
    rotation warp (RandAffineWithBoxesd parity)."""
    from adell_mri_tpu.models.detection import transform_boxes_affine
    from adell_mri_tpu.transforms import spatial as S

    shape = (24, 24, 12)
    img = jnp.zeros(shape + (1,))
    box = jnp.asarray([[14.0, 6.0, 4.0, 20.0, 12.0, 8.0]])
    img = img.at[15:20, 7:12, 5:8, 0].set(1.0)
    # 30-degree rotation about the z-pair + small scale
    mat = (
        S.center_matrix(shape, +1.0)
        @ S.rotation_matrix(3, jnp.asarray([0.5, 0.0, 0.0]))
        @ S.center_matrix(shape, -1.0)
    )
    warped = S.warp_affine(img, mat)
    new_box, valid = transform_boxes_affine(
        box, mat, jnp.asarray([True]), shape
    )
    assert bool(valid[0])
    w = np.asarray(warped)[..., 0]
    coords = np.argwhere(w > 0.5)
    com = coords.mean(0)
    nb = np.asarray(new_box[0])
    assert np.all(com >= nb[:3] - 0.5) and np.all(com <= nb[3:] + 0.5)
    # mass is preserved-ish (content did not vanish)
    assert w.sum() > 0.5 * float(img.sum())


def test_detection_transforms_affine_with_boxes():
    """DetectionTransforms with affine: warped image + re-rasterized targets
    stay consistent — decoding the augmented targets gives a box that covers
    the augmented image blob."""
    from adell_mri_tpu.transforms import AugmentPolicy
    from adell_mri_tpu.transforms.pipeline import DetectionTransforms

    shape, grid = (24, 24, 12), (6, 6, 3)
    img = np.zeros((2,) + shape + (1,), np.float32)
    img[:, 8:16, 8:16, 4:8, 0] = 1.0
    box = np.zeros((2, 4, 6), np.float32)
    box[:, 0] = [8.0, 8.0, 4.0, 16.0, 16.0, 8.0]
    batch = {
        "image": jnp.asarray(img),
        "boxes": jnp.asarray(box),
        "box_classes": jnp.ones((2, 4), jnp.float32),
        "n_boxes": jnp.asarray([1, 1], jnp.int32),
        # stale pre-aug targets that the augment must overwrite
        "objectness": jnp.zeros((2,) + grid + (len(ANCHORS),)),
        "center_offsets": jnp.zeros((2,) + grid + (len(ANCHORS) * 3,)),
        "sizes": jnp.zeros((2,) + grid + (len(ANCHORS) * 3,)),
        "classes": jnp.zeros((2,) + grid + (1,)),
    }
    tf = DetectionTransforms(
        augmentations=AugmentPolicy.from_flags(
            ["affine", "flip"], rotate_range=0.4, scale_range=0.1
        ),
        anchors=ANCHORS,
        grid_shape=grid,
        input_shape=shape,
    )
    out = jax.jit(tf.augment)(jax.random.PRNGKey(3), batch)
    for b in range(2):
        obj = np.moveaxis(np.asarray(out["objectness"][b]), -1, 0)
        ctr = np.moveaxis(np.asarray(out["center_offsets"][b]), -1, 0)
        sz = np.moveaxis(np.asarray(out["sizes"][b]), -1, 0)
        assert obj.sum() == 1  # one box survived
        dec, _ = anchor_targets_to_boxes(
            obj, ctr, sz, ANCHORS, input_shape=shape, threshold=0.5
        )
        w = np.asarray(out["image"][b, ..., 0])
        coords = np.argwhere(w > 0.5)
        assert len(coords) > 0
        com = coords.mean(0)
        assert np.all(com >= dec[0][:3] - 1.5)
        assert np.all(com <= dec[0][3:] + 1.5)


def test_multiclass_targets_match_head_channels():
    """n_classes > 2: target class channels equal the YOLONet3d head's
    (one-hot over n_classes, ids index directly) — the old n_classes-1
    layout crashed the first train step."""
    import numpy as np

    from adell_mri_tpu.models.detection import YOLONet3d
    from adell_mri_tpu.models.detection.anchors import (
        boxes_to_anchor_targets,
    )

    anchors = np.asarray([[4.0, 4.0, 2.0]], np.float32)
    boxes = np.asarray([[2, 2, 1, 8, 7, 4]], np.float32)
    obj, ctr, sz, cls = boxes_to_anchor_targets(
        boxes, np.asarray([2.0]), (4, 4, 2), anchors, (16, 16, 8),
        n_classes=3,
    )
    assert cls.shape[0] == 3  # n_classes channels
    assert cls[2].max() == 1.0 and cls[1].max() == 0.0

    model = YOLONet3d(
        n_anchors=1, n_classes=3,
        backbone_structure=[(4, 4, 3, 1)], norm_type="instance",
    )
    import jax

    x = jnp.ones((1, 16, 16, 8, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x)
    preds = model.apply(v, x)
    assert preds["classes"].shape[-1] == cls.shape[0]


def test_host_rasterizer_drops_cropped_out_boxes():
    """Regression: a box center left of the crop wrapped through numpy
    negative indexing and rasterized a ghost positive at the FAR edge."""
    from adell_mri_tpu.models.detection.anchors import boxes_to_anchor_targets

    obj, ctr, sz, cls = boxes_to_anchor_targets(
        np.asarray([[-20.0, 10, 10, -4, 20, 20]]),
        np.asarray([1]),
        grid_shape=(8, 8, 8),
        anchors=np.asarray([[8.0, 8.0, 8.0]]),
        input_shape=(64, 64, 64),
    )
    assert obj.sum() == 0  # dropped, not wrapped to cell 7


def test_yolo_loss_ciou_path():
    """With anchors+input_shape the regression term is decoded-box CIoU:
    perfect predictions give ~zero box loss, and gradients are finite."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.detection.losses import yolo_loss

    G = (4, 4, 2)
    A, ndim = 1, 3
    anchors = np.asarray([[8.0, 8.0, 4.0]], np.float32)
    obj = jnp.zeros((1,) + G + (A,)).at[0, 1, 2, 1, 0].set(1.0)
    ctr = jnp.full((1,) + G + (A * ndim,), 0.5)
    sz = jnp.zeros((1,) + G + (A * ndim,))
    cls = jnp.zeros((1,) + G + (1,)).at[0, 1, 2, 1, 0].set(1.0)
    targets = {
        "objectness": obj, "center_offsets": ctr, "sizes": sz, "classes": cls
    }
    preds_perfect = {
        "objectness": jnp.where(obj > 0, 8.0, -8.0),
        "center_offsets": ctr,
        "sizes": sz,
        "classes": jnp.where(cls > 0, 8.0, -8.0),
    }
    total, comp = yolo_loss(
        preds_perfect, targets, anchors=anchors, input_shape=(32, 32, 16)
    )
    assert float(comp["center"]) < 1e-3  # (1-IoU)+cpd at perfect overlap
    assert float(comp["size"]) < 1e-3  # aspect-ratio term
    assert np.isfinite(float(total))

    # gradients flow through the decoded CIoU and are finite
    def loss_of(offsets):
        p = dict(preds_perfect, center_offsets=offsets)
        return yolo_loss(
            p, targets, anchors=anchors, input_shape=(32, 32, 16)
        )[0]

    g = jax.grad(loss_of)(ctr + 0.1)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0

    # multiclass path uses softmax CE without crashing
    cls3_t = jnp.zeros((1,) + G + (3,)).at[0, 1, 2, 1, 2].set(1.0)
    t3 = dict(targets, classes=cls3_t)
    p3 = dict(preds_perfect, classes=jnp.zeros((1,) + G + (3,)))
    total3, _ = yolo_loss(
        p3, t3, n_classes=3, anchors=anchors, input_shape=(32, 32, 16)
    )
    assert np.isfinite(float(total3))


def test_ciou_identical_boxes_finite():
    """cpd eps guard: identical boxes were 0/0 in the raw formula."""
    from adell_mri_tpu.models.detection.losses import complete_iou_components

    b = np.asarray([[0.0, 0, 0, 10, 10, 10]], np.float32)
    iou, cpd, ar = complete_iou_components(b, b)
    assert np.isfinite(float(iou[0])) and float(iou[0]) == 1.0
    assert np.isfinite(float(cpd[0])) and np.isfinite(float(ar[0]))
