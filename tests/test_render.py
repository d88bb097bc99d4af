"""Headless rendering tests (overlay semantics of the reference UI)."""

import numpy as np

from tpu_inspect import render
from tpu_inspect.config import GridParams
from tpu_inspect.synthetic import random_blob_mask

GRID = GridParams(base_unit=(4, 5, 16, 12), units_x=2, units_y=2, unit_space_x=4, unit_space_y=3)


def test_tint_mask_alpha_semantics():
    m = np.zeros((6, 6), np.uint8)
    m[2, 3] = 255
    t = render.tint_mask(m, render.SEG_COLOR, 140)
    assert t.shape == (6, 6, 4)
    assert tuple(t[2, 3]) == (0, 255, 0, 140)
    assert t[0, 0, 3] == 0  # transparent off-mask
    assert tuple(t[0, 0, :3]) == (0, 255, 0)  # color constant everywhere


def test_combine_masks_defect_over_seg():
    seg = np.full((4, 4), 255, np.uint8)
    dft = np.zeros((4, 4), np.uint8)
    dft[1, 1] = 255
    c = render.combine_masks(seg, dft)
    # defect pixel dominated by red; elsewhere pure green a160
    assert c[0, 0, 3] == 160 and c[0, 0, 1] == 255
    assert c[1, 1, 0] > 150 and c[1, 1, 3] > 160
    assert render.combine_masks(None, None) is None


def test_render_canvas_modes():
    img = np.full((40, 50), 100, np.uint8)
    seg = [np.full((12, 16), 255, np.uint8)] * 4
    dft = [None, np.full((12, 16), 255, np.uint8), None, None]
    out_none = render.render_canvas(img, GRID, seg, dft, mode="None", draw_grid=False)
    np.testing.assert_array_equal(out_none, np.repeat(img[..., None], 3, 2))
    out_seg = render.render_canvas(img, GRID, seg, dft, mode="Segmentation", draw_grid=False)
    # inside unit 0: green blended at alpha 140 * 0.55
    px = out_seg[5 + 2, 4 + 2]
    assert px[1] > px[0] and px[1] > 100
    out_both = render.render_canvas(img, GRID, seg, dft, mode="Both", draw_grid=False)
    x, y, w, h = (24, 5, 16, 12)  # unit 1 rect
    px = out_both[y + 2, x + 2]
    assert px[0] > px[1]  # defect red wins over seg green


def test_render_inspection_markers():
    img = np.zeros((40, 50), np.uint8)
    out = render.render_inspection(img, GRID, {0: True, 1: False})
    x, y, w, h = 4, 5, 16, 12
    sub = out[y : y + h, x : x + w]
    assert (sub == np.array(render.DEFECT_COLOR)).all(axis=2).any()  # X drawn
    x, y, w, h = 24, 5, 16, 12
    sub = out[y : y + h, x : x + w]
    assert (sub == np.array(render.SEG_COLOR)).all(axis=2).any()  # O drawn
    # units 2, 3 have no verdict: no marker colors inside
    x, y, w, h = 4, 20, 16, 12
    sub = out[y + 1 : y + h - 1, x + 1 : x + w - 1]
    assert not (sub == np.array(render.DEFECT_COLOR)).all(axis=2).any()


def test_erosion_outline():
    m = random_blob_mask(40, 44, seed=3, n_blobs=1, scale=0.4)
    outline = render.erosion_outline_mask(m, 2)
    assert outline is not None and outline.any()
    # outline pixels lie on the eroded mask but not its interior
    import cv2

    er = cv2.erode(m, None, iterations=2)
    assert (er[outline] > 0).all()
    assert render.erosion_outline_mask(np.zeros((10, 10), np.uint8), 1) is None


def test_render_canvas_clips_out_of_bounds_boxes():
    """Boxes extending past the image edge must clip, not crash
    (round-1 advisor finding; the reference's QImage.copy pads)."""
    img = np.zeros((50, 40), np.uint8)
    grid = GridParams(base_unit=(30, 40, 20, 20))
    masks = np.full((1, 20, 20), 255, np.uint8)
    out = render.render_canvas(img, grid, seg_masks=masks, mode="Segmentation")
    assert out.shape == (50, 40, 3)
    assert out[45, 35, 1] > 0  # green tint inside the clipped region
    # fully outside: no-op
    grid2 = GridParams(base_unit=(100, 100, 20, 20))
    out2 = render.render_canvas(img, grid2, seg_masks=masks, mode="Both")
    assert (out2[..., 1] == render.render_canvas(img, grid2, mode="None")[..., 1]).all()


def test_erosion_inset_rect_fallback():
    assert render.erosion_inset_rect((10, 20, 30, 40), 6) == (16, 26, 18, 28)
    assert render.erosion_inset_rect((0, 0, 10, 10), 5) is None
    kind, rect = render.erosion_outline(None, (10, 20, 30, 40), 6)
    assert kind == "rect" and rect == (16, 26, 18, 28)
    assert render.erosion_outline(None, (0, 0, 10, 10), 5) is None
    mask = np.zeros((20, 20), np.uint8)
    mask[4:16, 4:16] = 255
    kind, outline = render.erosion_outline(mask, (0, 0, 20, 20), 2)
    assert kind == "mask"
    assert outline.shape == (20, 20) and outline.any()


def test_thumbnail_icon():
    crop = np.full((60, 80), 100, np.uint8)
    seg = np.zeros((60, 80), np.uint8)
    seg[10:30, 10:40] = 255
    dfm = np.zeros((60, 80), np.uint8)
    dfm[15:20, 15:25] = 255
    icon = render.thumbnail_icon(crop, seg, dfm, mode="Segmentation")
    assert icon.shape == (96, 128, 3)  # keep-aspect into 128
    y, x = 32, 40  # inside the scaled mask
    assert icon[y, x, 1] > icon[y, x, 0]  # green-tinted
    plain = render.thumbnail_icon(crop, seg, dfm, mode="None")
    assert (plain == 100).all()
    both = render.thumbnail_icon(crop, seg, dfm, mode="Both")
    assert both[28, 32, 0] > both[28, 32, 1]  # defect red wins on top
