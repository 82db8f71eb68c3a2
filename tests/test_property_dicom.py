"""
Property-based tests for the DICOM mini codec (data/dicom.py): the writer
quantizes to uint16 with a rescale slope/intercept, so a round trip must
recover values within half a quantization step, and orientation/position/
series metadata must survive exactly.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from adell_mri_tpu.data.dicom import read_dicom, write_dicom


@settings(max_examples=25, deadline=None)
@given(
    rows=st.integers(2, 32),
    cols=st.integers(2, 32),
    lo=st.floats(-1000, 1000),
    span=st.floats(1e-3, 5000),
    seed=st.integers(0, 2**31 - 1),
)
def test_dicom_round_trip_quantization(
    tmp_path_factory, rows, cols, lo, span, seed
):
    tmp = tmp_path_factory.mktemp("dcm")
    rng = np.random.default_rng(seed)
    data = (rng.random((rows, cols)) * span + lo).astype(np.float32)
    path = str(tmp / "s.dcm")
    orient = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0]
    pos = [float(lo), 2.5, -3.0]
    write_dicom(path, data, series_uid="9.8.7", orientation=orient,
                position=pos)
    arr, meta = read_dicom(path)
    assert arr.shape == (rows, cols)
    # uint16 quantization: half a step of the actual span, plus f32 slack
    real_span = float(data.max() - data.min())
    tol = max(real_span, 1e-6) / 65535 * 0.51 + 1e-3
    assert float(np.abs(arr - data).max()) <= tol
    assert meta["series_uid"] == "9.8.7"
    np.testing.assert_allclose(meta["orientation"], orient, atol=1e-6)
    np.testing.assert_allclose(meta["position"], pos, atol=1e-4)
