"""Viewport math tests (ImageWidget coordinate/zoom parity)."""

from tpu_inspect.viewport import Viewport


def _vp(**kw):
    return Viewport(image_w=4096, image_h=3000, view_w=1200, view_h=900, **kw)


def test_base_scale_fits_viewport():
    vp = _vp()
    assert vp.base_scale == min(1200 / 4096, 900 / 3000)
    dw, dh = vp.display_size
    assert dw <= 1200 and dh <= 900


def test_transforms_round_trip_and_clamp():
    vp = _vp(manual_zoom=2.0)
    dr = vp.imgrect_to_display((251, 232, 316, 315))
    assert dr == tuple(int(v * vp.scale) for v in (251, 232, 316, 315))
    # reference truncates and clamps (indexing_ui.py:554-562)
    assert vp.display_to_img(-5, -5) == (0, 0)
    big = vp.display_to_img(1e9, 1e9)
    assert big == (4095, 2999)
    ix, iy = vp.display_to_img(*[c * vp.scale for c in (300, 200)])
    assert abs(ix - 300) <= 1 and abs(iy - 200) <= 1


def test_center_on_cell_fills_80pct_and_centers():
    vp = _vp()
    cell = (251, 232, 316, 315)
    vp.center_on_cell(cell)
    dx, dy, dw, dh = vp.imgrect_to_display(cell)
    # the limiting dimension fills ~80% of the viewport
    assert abs(max(dw / 1200, dh / 900) - 0.8) < 0.01
    # center of cell lands at viewport center (unless clamped)
    assert abs((dx + dw // 2) - (vp.scroll_x + 600)) <= 1
    assert abs((dy + dh // 2) - (vp.scroll_y + 450)) <= 1


def test_center_on_cell_clamps_at_origin():
    vp = _vp()
    vp.center_on_cell((0, 0, 300, 300))
    assert vp.scroll_x == 0 or vp.scroll_y == 0


def test_zoom_floor():
    vp = _vp()
    vp.zoom_out(1000)
    assert vp.manual_zoom == 0.1
