"""End-to-end UI-flow test: drives the web client's HTTP API through the
reference tool's workflow (load -> index -> segment -> exclusions ->
defect tuning -> inspection -> export), mirroring indexing_ui.py's button
handlers headlessly."""

import json
import os
import urllib.request

import numpy as np
import pytest

from tpu_inspect.config import DefectParams, GridParams, SegmentationParams
from tpu_inspect.synthetic import crop_units, make_mold_image
from tpu_inspect.ui import UIServer


@pytest.fixture(scope="module")
def grid():
    return GridParams(base_unit=(6, 8, 48, 44), units_x=2, units_y=2)


@pytest.fixture(scope="module")
def image(grid):
    return make_mold_image(grid, (110, 115), seed=3, defect_rate=0.9)


@pytest.fixture()
def server():
    srv = UIServer()
    srv.start()
    yield srv
    srv.stop()


def _call(srv, op, body=None):
    req = urllib.request.Request(
        f"{srv.url}api/{op}",
        data=json.dumps(body or {}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read()), r.status
    except urllib.error.HTTPError as e:
        return json.loads(e.read()), e.code


def _get(srv, path):
    try:
        with urllib.request.urlopen(f"{srv.url}{path}") as r:
            return r.read(), r.status
    except urllib.error.HTTPError as e:
        return e.read(), e.code


def _state(srv):
    body, status = _get(srv, "api/state")
    assert status == 200
    return json.loads(body)


def _png_shape(data: bytes):
    import cv2

    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED)
    assert img is not None, "canvas PNG did not decode"
    return img.shape


def test_ui_full_workflow(server, grid, image, tmp_path):
    import cv2

    # -- load via path and via drag-and-drop upload --------------------------
    p1 = str(tmp_path / "ref.png")
    cv2.imwrite(p1, image)
    out, status = _call(server, "load", {"path": p1})
    assert status == 200 and out["ok"]

    import base64

    ok, buf = cv2.imencode(".png", image)
    out, status = _call(
        server,
        "load",
        {"name": "capture2.png", "png_base64": base64.b64encode(buf).decode()},
    )
    assert status == 200
    st = _state(server)
    assert st["images"] == [p1, "capture2.png"]
    assert st["reference"] == p1 and st["current"] == p1

    # -- serve the app shell --------------------------------------------------
    html, status = _get(server, "")
    assert status == 200 and b"tpu-inspect" in html

    # -- grid preview then apply indexing ------------------------------------
    body = {
        "base_unit": list(grid.base_unit),
        "units_x": grid.units_x,
        "units_y": grid.units_y,
    }
    out, status = _call(server, "grid_preview", body)
    assert status == 200 and len(out["boxes"]) == 4
    out, status = _call(server, "indexing", body)
    assert status == 200 and out["num_units"] == 4
    assert len(_state(server)["boxes"]) == 4

    # -- segmentation + exclusion add (reference image) -----------------------
    out, status = _call(server, "run_segmentation", {})
    assert status == 200 and out["units"] == 4
    excl = {"shape": "rect", "x": 2, "y": 2, "w": 8, "h": 6}
    out, status = _call(server, "exclusion_add", {"excl": excl})
    assert status == 200 and out["index"] == 0
    st = _state(server)
    assert st["has_seg"] and len(st["exclusions"]) == 1
    assert st["overlay_mode"] == "Segmentation"  # :2207-2212

    # -- canvas + thumbnails render ------------------------------------------
    png, status = _get(server, "api/canvas.png?mode=Segmentation")
    assert status == 200
    h, w = _png_shape(png)[:2]
    assert (w, h) == tuple(st["image_size"])
    png, status = _get(server, "api/thumb.png?idx=0&mode=Both")
    assert status == 200
    assert max(_png_shape(png)[:2]) == 128  # 128-px icons (:2408-2445)

    # -- single-unit defect test (zoom payload + log line, :1411-1469) -------
    out, status = _call(server, "select", {"idx": 2})
    assert status == 200
    out, status = _call(server, "test_defect", {"idx": 2})
    assert status == 200 and out["verdict"] in ("NG", "OK")
    assert out["zoom_to"] == _state(server)["boxes"][2]
    assert any("Unit 2: defect area=" in ln for ln in _state(server)["log"])

    # -- inspection toggle: X/O verdicts match the engine directly ------------
    out, status = _call(server, "inspection", {"enabled": True})
    assert status == 200 and out["enabled"]
    st = _state(server)
    assert st["inspection_enabled"] and len(st["verdicts"]) == 4

    from tpu_inspect import engine

    seg_res, _ = engine.inspect_image(
        image, grid, SegmentationParams(), DefectParams(),
        exclusions=[excl], is_reference=True,
    )
    insp = engine.detect_defects_batch(
        np.asarray(crop_units(image, grid)), seg_res.masks, DefectParams()
    )
    assert st["verdicts"] == [bool(v) for v in insp.verdicts]
    assert st["areas"] == [int(a) for a in insp.areas]
    png, status = _get(server, "api/canvas.png")  # X/O view renders
    assert status == 200 and _png_shape(png)[2] == 3

    # -- param change exits inspection (indexing_ui.py:1305-1316) -------------
    out, status = _call(
        server,
        "defect_params",
        {"method": "threshold", "threshold": 30, "min_area": 20, "erode_px": 6},
    )
    assert status == 200
    st = _state(server)
    assert not st["inspection_enabled"]
    out, status = _call(server, "auto_update_defect", {"idx": 2})
    assert status == 200

    # -- exclusion modify/delete + reference lock ------------------------------
    out, status = _call(
        server,
        "exclusion_modify",
        {"idx": 0, "excl": {"shape": "rect", "x": 1, "y": 1, "w": 5, "h": 5}},
    )
    assert status == 200
    out, status = _call(server, "switch", {"path": "capture2.png"})
    assert status == 200
    out, status = _call(server, "exclusion_add", {"excl": excl})
    assert status == 400 and "locked" in out["error"]  # :1764-1777
    out, status = _call(server, "switch", {"path": p1})
    assert status == 200
    out, status = _call(server, "exclusion_delete", {"idx": 0})
    assert status == 200
    assert _state(server)["exclusions"] == []

    # -- persistence round trip ------------------------------------------------
    gpath = str(tmp_path / "grid.json")
    out, status = _call(server, "export_grid", {"path": gpath})
    assert status == 200 and out["grid"]["version"] == 2
    out, status = _call(server, "import_grid", {"path": gpath})
    assert status == 200 and out["boxes"] == 4
    mdir = str(tmp_path / "masks")
    out, status = _call(server, "export_masks", {"dir": mdir})
    assert status == 200
    assert os.path.exists(os.path.join(mdir, "masks_summary.csv"))
    assert os.path.exists(os.path.join(mdir, "mask_0000.png"))
    tdir = str(tmp_path / "thumbs")
    out, status = _call(server, "export_thumbnails", {"dir": tdir})
    assert status == 200 and out["count"] == 4
    assert os.path.exists(os.path.join(tdir, "unit_0003.png"))


def test_ui_errors(server):
    out, status = _call(server, "switch", {"path": "nope.png"})
    assert status == 400 and "unknown image" in out["error"]
    out, status = _call(server, "run_segmentation", {})
    assert status == 400
    out, status = _call(server, "nosuchop", {})
    assert status == 400
    _, status = _get(server, "api/nothing")
    assert status == 404
