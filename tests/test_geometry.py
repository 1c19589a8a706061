"""Geometry generator parity with the reference placement tables.

Expected values cite /root/reference/constants.cl (device tables) and
/root/reference/constants.h (host tables).
"""

import numpy as np
import pytest

from vvc_affine_tpu import constants as C
from vvc_affine_tpu import geometry as G


def test_aligned_counts_and_strides():
    lay = G.layout("full")
    assert len(lay.classes) == 12
    assert lay.cus_per_ctu == 201  # constants.cl:118
    # RETURN_STRIDE_LIST (constants.cl:126-141)
    assert lay.return_strides == (0, 1, 3, 5, 9, 17, 25, 41, 57, 73, 105, 137)
    sizes = [(c.width, c.height) for c in lay.classes]
    assert sizes == [
        (128, 128), (128, 64), (64, 128), (64, 64), (64, 32), (32, 64),
        (32, 32), (64, 16), (16, 64), (32, 16), (16, 32), (16, 16),
    ]  # constants.cl:74-113


def test_aligned_positions_raster():
    lay = G.layout("full")
    # aligned CU i of class k sits at ((i % (128/w))*w, (i // (128/w))*h)
    for c in lay.classes:
        cols = 128 // c.width
        for i in range(c.num_cus):
            assert c.xs[i] == (i % cols) * c.width
            assert c.ys[i] == (i // cols) * c.height
        # perfect tiling of the CTU
        cover = np.zeros((128, 128), np.int32)
        for x, y in zip(c.xs, c.ys):
            cover[y : y + c.height, x : x + c.width] += 1
        assert (cover == 1).all()


def test_half_aligned_counts_and_strides():
    lay = G.layout("half")
    assert len(lay.classes) == 24
    assert lay.cus_per_ctu == 284  # constants.cl:119
    # HA_CUS_PER_CTU (constants.cl:363-398)
    assert tuple(c.num_cus for c in lay.classes) == (
        4, 4, 8, 4, 8, 4, 8, 8, 16, 8, 16, 16, 8, 16, 32, 32, 16, 16,
        4, 8, 4, 8, 4, 32,
    )
    # HA_RETURN_STRIDE_LIST (constants.cl:402-435)
    assert lay.return_strides == (
        0, 4, 8, 16, 20, 28, 32, 40, 48, 64, 72, 88, 104, 112, 128, 160,
        192, 208, 224, 228, 236, 240, 248, 252,
    )


# HA_ALL_X_POS / HA_ALL_Y_POS spot rows (constants.cl:207-281)
@pytest.mark.parametrize(
    "idx,xs,ys",
    [
        (0, (0, 64, 0, 64), (16, 16, 80, 80)),
        (2, (0, 64) * 4, (8, 8, 40, 40, 72, 72, 104, 104)),
        (7, (0, 32, 64, 96) * 2, (16,) * 4 + (80,) * 4),
        (10, (16, 80) * 8,
         (0, 0, 16, 16, 32, 32, 48, 48, 64, 64, 80, 80, 96, 96, 112, 112)),
        (14, tuple(range(0, 128, 16)) * 4,
         (8,) * 8 + (40,) * 8 + (72,) * 8 + (104,) * 8),
        (18, (16, 80, 16, 80), (16, 16, 80, 80)),
        (23,
         (8, 24, 40, 72, 88, 104, 8, 40, 72, 104, 8, 24, 40, 72, 88, 104,
          8, 24, 40, 72, 88, 104, 8, 40, 72, 104, 8, 24, 40, 72, 88, 104),
         (8,) * 6 + (24,) * 4 + (40,) * 6 + (72,) * 6 + (88,) * 4 + (104,) * 6),
    ],
)
def test_half_aligned_positions(idx, xs, ys):
    lay = G.layout("half")
    assert lay.classes[idx].xs == xs
    assert lay.classes[idx].ys == ys


def test_half_aligned_no_overlap_within_class():
    lay = G.layout("half")
    for c in lay.classes:
        cover = np.zeros((128, 128), np.int32)
        for x, y in zip(c.xs, c.ys):
            assert x + c.width <= 128 and y + c.height <= 128
            cover[y : y + c.height, x : x + c.width] += 1
        assert cover.max() == 1


def test_compute_class_merge_roundtrip():
    for mode, n_expected in (("full", 12), ("half", 8)):
        lay = G.layout(mode)
        assert len(lay.compute_classes) == n_expected
        seen = np.zeros(lay.cus_per_ctu, np.int32)
        for g in lay.compute_classes:
            flat = np.asarray(g.cu_flat_idx)
            seen[flat] += 1
            np.testing.assert_array_equal(lay.cu_x[flat], g.xs)
            np.testing.assert_array_equal(lay.cu_y[flat], g.ys)
            assert (lay.cu_w[flat] == g.width).all()
            assert (lay.cu_h[flat] == g.height).all()
        assert (seen == 1).all()


def test_num_ctus_matches_reference_table():
    # availableRes (constants.h:73-79)
    for w, h, n in [
        (3840, 2160, 510), (1920, 1080, 135), (1280, 720, 60),
        (832, 480, 28), (416, 240, 8),
    ]:
        assert C.num_ctus(w, h) == n
        g = G.frame_grid(w, h)
        assert g.num_ctus == n


def test_lambda_model():
    # spot values from testReferences traces: QP32 ⇒ POC1 eff-QP 40
    assert C.compute_delta_qp(32, 1) == 40
    assert C.compute_delta_qp(32, 8) == 33
    assert np.isclose(C.lambda_for(32, 1), 78.949063)
    # fullLambdas table endpoints (constants.h:94-103)
    assert np.isclose(C.FULL_LAMBDAS[11], 2.769291)
    assert np.isclose(C.FULL_LAMBDAS[59], 708.938619)
