"""Host-side label ops (labels.py parity targets)."""

import numpy as np

from adell_mri_tpu.transforms.labels import (
    combine_binary_labels,
    convert_to_one_hot,
    convex_hull,
    crop_from_mask,
    dbscan_segment_selection,
    label_operator,
    label_operator_segmentation,
    mask_to_bb,
)


def test_label_operator_scalar():
    assert label_operator(2, [0, 1, 2], mode="cat") == 2
    assert label_operator(2, [0, 1, 2], mode="binary", positive_labels=[2]) == 1
    assert label_operator(1, [0, 1, 2], mode="binary", positive_labels=[2]) == 0
    assert (
        label_operator(3, [0, 1, 2, 3], label_groups=[[0, 1], [2, 3]]) == 1
    )
    assert label_operator([0, 2], [0, 1, 2], mode="cat") == 2  # max of list


def test_label_operator_segmentation():
    mask = np.array([[0, 1], [2, 3]], np.float32)
    b = label_operator_segmentation(mask, [0, 1, 2, 3], "binary", [2, 3])
    np.testing.assert_array_equal(b, [[0, 0], [1, 1]])
    c = label_operator_segmentation(mask, [0, 2], "cat")
    np.testing.assert_array_equal(c, [[0, 0], [1, 0]])


def test_combine_and_one_hot():
    m1 = np.array([1, 0, 0], np.float32)
    m2 = np.array([1, 1, 0], np.float32)
    np.testing.assert_array_equal(
        combine_binary_labels([m1, m2], "any"), [1, 1, 0]
    )
    np.testing.assert_array_equal(
        combine_binary_labels([m1, m2], "majority"), [1, 0, 0]
    )
    sample = {"a": m1, "b": m2}
    out = convert_to_one_hot(sample, ["a", "b"])
    np.testing.assert_array_equal(out["label"], [2, 2, 0])  # b overwrites a


def test_convex_hull_fills_concavity():
    sl = np.zeros((16, 16), np.float32)
    sl[2:14, 2:4] = 1
    sl[2:14, 10:12] = 1
    sl[2:4, 2:12] = 1  # U shape
    hull = convex_hull(sl)
    assert hull.sum() > sl.sum()  # concavity filled
    assert hull[8, 7] == 1.0  # inside the U's mouth
    # 3D slice-wise
    vol = np.stack([sl, sl], axis=-1)
    assert convex_hull(vol).shape == vol.shape


def test_dbscan_selection_keeps_largest():
    mask = np.zeros((24, 24), np.float32)
    mask[2:10, 2:10] = 1  # large blob
    mask[20, 20] = 1  # speck far away
    out = dbscan_segment_selection(mask, filter_by_size=True, keep_n=1)
    assert out[5, 5] == 1.0
    assert out[20, 20] == 0.0
    # empty mask -> empty output
    assert dbscan_segment_selection(np.zeros((8, 8))).sum() == 0


def test_mask_to_bb():
    mask = np.zeros((16, 16), np.float32)
    mask[2:6, 3:7] = 1
    mask[10:12, 10:14] = 1
    boxes = mask_to_bb(mask)
    assert boxes.shape == (2, 4)
    np.testing.assert_array_equal(boxes[0], [2, 3, 5, 6])
    assert mask_to_bb(np.zeros((4, 4))).shape == (0, 4)


def test_crop_from_mask():
    img = np.arange(16 * 16, dtype=np.float32).reshape(16, 16)
    mask = np.zeros((16, 16), np.float32)
    mask[4:8, 6:10] = 1
    out = crop_from_mask(img, mask)
    assert out.shape == (4, 4)
    assert out[0, 0] == img[4, 6]
    # margin + fixed output size
    out2 = crop_from_mask(img, mask, output_size=(8, 8), margin=1)
    assert out2.shape == (8, 8)
    # list of images
    outs = crop_from_mask([img, img * 2], mask)
    assert len(outs) == 2 and np.all(outs[1] == outs[0] * 2)
