"""Scripted exercise of the canvas interaction layer (ui/app.html).

No JS engine exists in this environment (no node, no browser), so the
rubber-band / drag-handle / debounce state machine of app.html:241-420
cannot execute directly in CI. This harness is the next-closest thing:

1. ``CanvasModel`` is a line-faithful Python port of the canvas JS — the
   mousedown/mousemove/mouseup/click state machine, the exclusion
   base-relative coordinate math with its exact rounding and min-size
   clamps, the drag-move/resize handle updates, the 400/250 ms parameter
   debounce, and every button handler — issuing the SAME HTTP ops with the
   SAME payloads against a live UIServer.
2. ``test_canvas_contract_strings`` pins the model to the real JS: every
   op name, payload key pattern, rounding call, and debounce constant the
   model replicates is asserted to literally appear in app.html, so a
   protocol change in the JS fails this suite instead of silently
   diverging from the harness.
3. ``test_canvas_interaction_flow`` drives the full reference workflow
   through mouse/button events (draw base unit -> apply indexing -> run
   segmentation -> draw/drag/resize exclusions -> select unit ->
   single-unit defect test -> parameter debounce -> X/O inspection) and
   asserts the resulting session state matches the oracle flow
   (indexing_ui.py:386-524 interaction semantics).
"""

import json
import math
import os
import urllib.request

import numpy as np
import pytest

from tpu_inspect.config import DefectParams, GridParams, SegmentationParams
from tpu_inspect.synthetic import crop_units, make_mold_image
from tpu_inspect.ui import UIServer

APP_HTML = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tpu_inspect", "ui", "app.html",
)


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


class CanvasModel:
    """Python port of app.html's interaction state machine.

    Mouse coordinates are IMAGE coordinates (the JS's toImg() output —
    zoom/pan only change the screen->image transform, which has no effect
    on the ops emitted, so the model works in image space directly).
    """

    SEG_DEBOUNCE_MS = 400
    DEF_DEBOUNCE_MS = 250

    def __init__(self, srv):
        self.srv = srv
        self.mode = "select"
        self.drag = None
        self.sel_excl = None
        self.pending_base = None
        self.ops = []  # (op, body) log, for protocol assertions
        self._seg_timer = None  # pending (deadline_ms, payload)
        self._def_timer = None
        self._clock = 0.0
        self.S = None
        self.refresh()

    # ---- transport (the JS api()/refresh() pair) ---------------------------
    def api(self, op, body=None):
        self.ops.append((op, body or {}))
        req = urllib.request.Request(
            f"{self.srv.url}api/{op}",
            data=json.dumps(body or {}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            return json.loads(e.read())

    def refresh(self):
        with urllib.request.urlopen(f"{self.srv.url}api/state") as r:
            self.S = json.loads(r.read())
        return self.S

    # ---- debounce clock (setTimeout(fn, ms) with clearTimeout on re-input) -
    def elapse(self, ms):
        """Advance the virtual clock; fire timers whose deadline passed."""
        self._clock += ms
        for attr, fire in (("_seg_timer", self._fire_seg),
                           ("_def_timer", self._fire_def)):
            t = getattr(self, attr)
            if t is not None and self._clock >= t[0]:
                setattr(self, attr, None)
                fire(t[1])

    def _fire_seg(self, payload):
        self.api("seg_params", payload)
        if self.S.get("has_seg"):
            self.api("run_segmentation", {})
        self.refresh()

    def _fire_def(self, payload):
        self.api("defect_params", payload)
        if self.S.get("selected") is not None and self.S.get("has_seg"):
            self.api("auto_update_defect", {"idx": self.S["selected"]})
        self.refresh()

    def seg_input(self, **fields):
        """An <input> event on a segmentation param control (segChanged)."""
        sp = dict(self.S["seg_params"])
        sp.update(fields)
        payload = {k: sp[k] for k in
                   ("method", "gaussian_blur", "morph_kernel",
                    "adapt_block", "adapt_C")}
        self._seg_timer = (self._clock + self.SEG_DEBOUNCE_MS, payload)

    def defect_input(self, **fields):
        dp = dict(self.S["defect_params"])
        dp.update(fields)
        payload = {k: dp[k] for k in
                   ("method", "threshold", "min_area", "erode_px")}
        self._def_timer = (self._clock + self.DEF_DEBOUNCE_MS, payload)

    # ---- mouse state machine (wrap mousedown/mousemove/mouseup/click) ------
    def mouse_down(self, ix, iy, button=0, shift=False, on_excl=None,
                   on_handle=False):
        if not self.S or not self.S.get("current"):
            return
        if on_excl is not None:
            # exclusion element / handle mousedown (stopPropagation)
            if on_handle:
                e = dict(self.S["exclusions"][on_excl])
                self.drag = {"kind": "excl-resize", "i": on_excl,
                             "mx": ix, "my": iy, "orig": e}
                return
            if not self.S.get("is_reference"):
                return
            self.sel_excl = on_excl
            e = dict(self.S["exclusions"][on_excl])
            self.drag = {"kind": "excl-move", "i": on_excl,
                         "mx": ix, "my": iy, "orig": e}
            return
        if button in (1, 2) or (self.mode == "select" and shift):
            self.drag = {"kind": "pan"}
            return
        if self.mode in ("base", "excl-rect", "excl-circle"):
            self.drag = {"kind": self.mode, "x0": ix, "y0": iy,
                         "x1": ix, "y1": iy}

    def mouse_move(self, ix, iy):
        d = self.drag
        if not d:
            return
        if d["kind"] == "pan":
            return
        if d["kind"] in ("excl-move", "excl-resize"):
            e = dict(d["orig"])
            dx, dy = ix - d["mx"], iy - d["my"]
            if d["kind"] == "excl-move":
                if e["shape"] == "circle":
                    e["cx"] = d["orig"]["cx"] + dx
                    e["cy"] = d["orig"]["cy"] + dy
                else:
                    e["x"] = d["orig"]["x"] + dx
                    e["y"] = d["orig"]["y"] + dy
            else:
                if e["shape"] == "circle":
                    e["r"] = max(1, d["orig"]["r"] + dx)
                else:
                    e["w"] = max(1, d["orig"]["w"] + dx)
                    e["h"] = max(1, d["orig"]["h"] + dy)
            for k in e:
                if k != "shape":
                    e[k] = round(e[k])
            d["live"] = e
            return
        d["x1"], d["y1"] = ix, iy

    def mouse_up(self):
        d = self.drag
        if not d:
            return
        self.drag = None
        if d["kind"] == "pan":
            return
        if d["kind"] in ("excl-move", "excl-resize"):
            if d.get("live"):
                self.api("exclusion_modify", {"idx": d["i"], "excl": d["live"]})
                self.refresh()
            return
        x = round(min(d["x0"], d["x1"]))
        y = round(min(d["y0"], d["y1"]))
        w = round(abs(d["x1"] - d["x0"]))
        h = round(abs(d["y1"] - d["y0"]))
        if d["kind"] == "base":
            if w > 2 and h > 2:
                self.pending_base = [x, y, w, h]
            self.mode = "select"
            return
        if d["kind"] in ("excl-rect", "excl-circle"):
            if not self.S["boxes"]:
                return
            bx, by = self.S["boxes"][0][0], self.S["boxes"][0][1]
            if d["kind"] == "excl-circle":
                r = round(math.hypot(d["x1"] - d["x0"], d["y1"] - d["y0"]))
                excl = {"shape": "circle", "cx": round(d["x0"] - bx),
                        "cy": round(d["y0"] - by), "r": max(1, r)}
            else:
                excl = {"shape": "rect", "x": x - bx, "y": y - by,
                        "w": max(1, w), "h": max(1, h)}
            self.mode = "select"
            self.api("exclusion_add", {"excl": excl})
            self.refresh()

    def click(self, ix, iy, shift=False):
        if self.mode != "select" or not self.S or not self.S["boxes"] or shift:
            return
        for i, (x, y, w, h) in enumerate(self.S["boxes"]):
            if x <= ix < x + w and y <= iy < y + h:
                self.api("select", {"idx": i})
                self.refresh()
                return
        self.api("select", {"idx": None})
        self.refresh()

    # ---- buttons ------------------------------------------------------------
    def btn_base(self):
        self.mode = "select" if self.mode == "base" else "base"

    def btn_excl_rect(self):
        self.mode = "select" if self.mode == "excl-rect" else "excl-rect"

    def btn_excl_circle(self):
        self.mode = "select" if self.mode == "excl-circle" else "excl-circle"

    def btn_excl_del(self):
        if self.sel_excl is None:
            return
        self.api("exclusion_delete", {"idx": self.sel_excl})
        self.sel_excl = None
        self.refresh()

    def btn_index(self, **spinners):
        base = self.pending_base or (
            self.S["grid"] and self.S["grid"].get("base_unit")
        )
        if not base:
            return None
        body = {"base_unit": base}
        for k in ("units_x", "units_y", "blocks_x", "blocks_y",
                  "unit_space_x", "unit_space_y",
                  "block_space_x", "block_space_y"):
            body[k] = spinners.get(
                k,
                (self.S["grid"] or {}).get(
                    k, 1 if ("units_" in k or "blocks_" in k) else 0
                ),
            )
        r = self.api("indexing", body)
        self.refresh()
        return r

    def btn_seg(self):
        r = self.api("run_segmentation", {})
        self.refresh()
        return r

    def btn_test(self):
        if self.S["selected"] is None:
            return None
        r = self.api("test_defect", {"idx": self.S["selected"]})
        self.refresh()
        return r

    def btn_test_all(self):
        r = self.api("test_all", {})
        self.refresh()
        return r

    def btn_inspect(self):
        r = self.api("inspection",
                     {"enabled": not self.S["inspection_enabled"]})
        self.refresh()
        return r


# --- 2. contract: every op/constant the model replicates is in the JS -------

def test_canvas_contract_strings():
    with open(APP_HTML, encoding="utf-8") as f:
        js = f.read()
    # ops with their payload shapes, as the JS source spells them
    for snippet in [
        'api("select", {idx: i})',
        'api("select", {idx: null})',
        'api("exclusion_modify", {idx: d.i, excl: d.live})',
        'api("exclusion_add", {excl})',
        'api("exclusion_delete", {idx: selExcl})',
        'api("indexing", body)',
        'api("run_segmentation", {})',
        'api("test_defect", {idx: S.selected})',
        'api("test_all", {})',
        'api("inspection", {enabled: !S.inspection_enabled})',
        'api("seg_params", {method: $("seg-method").value,',
        'api("defect_params", {method: $("def-method").value,',
        'api("auto_update_defect", {idx: S.selected})',
    ]:
        assert snippet in js, f"canvas JS lost protocol snippet: {snippet}"
    # rubber-band / exclusion coordinate math the model mirrors
    for snippet in [
        "Math.round(Math.min(d.x0, d.x1))",
        "Math.round(Math.abs(d.x1 - d.x0))",
        "if (w > 2 && h > 2) { pendingBase = [x, y, w, h];",
        'excl = {shape: "rect", x: x - bx, y: y - by,',
        "w: Math.max(1, w), h: Math.max(1, h)};",
        "Math.round(Math.hypot(d.x1 - d.x0, d.y1 - d.y0))",
        "cy: Math.round(d.y0 - by), r: Math.max(1, r)};",
        "e.cx = drag.orig.cx + dx; e.cy = drag.orig.cy + dy;",
        "e.r = Math.max(1, drag.orig.r + dx);",
        "e.w = Math.max(1, drag.orig.w + dx); e.h = Math.max(1, drag.orig.h + dy);",
        'for (const k in e) if (k !== "shape") e[k] = Math.round(e[k]);',
        "if (!S.is_reference) return;",
        "if (ix >= x && ix < x + w && iy >= y && iy < y + h)",
    ]:
        assert snippet in js, f"canvas JS lost state-machine snippet: {snippet}"
    # debounce constants (reference: 400 ms seg, 250 ms defect)
    assert "}, 400);" in js and "}, 250);" in js
    assert "clearTimeout(segTimer)" in js and "clearTimeout(defTimer)" in js
    assert "if (S.has_seg) {" in js
    assert "if (S.selected !== null && S.has_seg)" in js


# --- 3. the scripted interaction flow ----------------------------------------

def test_canvas_interaction_flow(server, grid, image, tmp_path):
    import cv2

    from tpu_inspect import oracle

    p1 = str(tmp_path / "ref.png")
    cv2.imwrite(p1, image)

    cv = CanvasModel(server)
    cv.api("load", {"path": p1})
    cv.refresh()
    assert cv.S["current"]

    # draw the base unit with a sloppy reversed drag (btn, down, move, up)
    bx, by, bw, bh = grid.base_unit
    cv.btn_base()
    assert cv.mode == "base"
    cv.mouse_down(bx + bw, by + bh)          # start at bottom-right
    cv.mouse_move(bx + 3, by + 5)
    cv.mouse_move(bx, by)                    # end at top-left
    cv.mouse_up()
    assert cv.mode == "select"
    assert cv.pending_base == [bx, by, bw, bh]

    # a too-small drag must NOT replace the pending base
    cv.btn_base()
    cv.mouse_down(50, 50)
    cv.mouse_move(52, 51)
    cv.mouse_up()
    assert cv.pending_base == [bx, by, bw, bh]

    # apply indexing with the spinner values
    r = cv.btn_index(units_x=grid.units_x, units_y=grid.units_y,
                     unit_space_x=grid.unit_space_x,
                     unit_space_y=grid.unit_space_y)
    assert r["num_units"] == 4
    assert len(cv.S["boxes"]) == 4

    # run segmentation, then draw one rect + one circle exclusion with the
    # mouse in ABSOLUTE image coordinates; the ops must carry base-relative
    # geometry exactly as the JS computes it
    cv.btn_seg()
    assert cv.S["has_seg"]

    cv.btn_excl_rect()
    cv.mouse_down(bx + 10, by + 12)
    cv.mouse_move(bx + 30, by + 26)
    cv.mouse_up()
    cv.btn_excl_circle()
    cv.mouse_down(bx + 35, by + 30)
    cv.mouse_move(bx + 35 + 3, by + 30 + 4)  # r = hypot(3,4) = 5
    cv.mouse_up()
    assert cv.S["exclusions"] == [
        {"shape": "rect", "x": 10, "y": 12, "w": 20, "h": 14},
        {"shape": "circle", "cx": 35, "cy": 30, "r": 5},
    ]

    # drag-move the rect by (+4, -3): mousedown ON the exclusion, two
    # moves, mouseup -> one exclusion_modify with the rounded live geometry
    n_mod0 = sum(1 for op, _ in cv.ops if op == "exclusion_modify")
    cv.mouse_down(bx + 15, by + 15, on_excl=0)
    cv.mouse_move(bx + 17, by + 13)
    cv.mouse_move(bx + 19, by + 12)
    cv.mouse_up()
    assert cv.S["exclusions"][0] == {
        "shape": "rect", "x": 14, "y": 9, "w": 20, "h": 14}
    # resize via the bottom-right handle: +5 wide, +2 tall, clamped >= 1
    cv.mouse_down(bx + 34, by + 23, on_excl=0, on_handle=True)
    cv.mouse_move(bx + 39, by + 25)
    cv.mouse_up()
    assert cv.S["exclusions"][0] == {
        "shape": "rect", "x": 14, "y": 9, "w": 25, "h": 16}
    assert sum(1 for op, _ in cv.ops if op == "exclusion_modify") == n_mod0 + 2

    # the exclusions re-ran segmentation server-side; state must now match
    # the oracle flow with the same exclusion list
    seg = SegmentationParams(**{k: cv.S["seg_params"][k]
                                for k in cv.S["seg_params"]}).validated()
    crops = crop_units(image, grid)
    ref_masks, _, _ = oracle.segment_all_units(
        crops, seg, exclusions=cv.S["exclusions"]
    )

    # click inside unit 2 -> select; outside any unit -> deselect+reselect
    x2, y2, w2, h2 = cv.S["boxes"][2]
    cv.click(x2 + 5, y2 + 5)
    assert cv.S["selected"] == 2
    cv.click(0, 0)
    assert cv.S["selected"] is None
    cv.click(x2 + 5, y2 + 5)

    # single-unit defect test (the Test button)
    r = cv.btn_test()
    assert r is not None and "found" in r

    # defect param debounce: two quick spins coalesce into ONE
    # defect_params (+auto_update for the selected unit) after 250 ms
    n_def0 = sum(1 for op, _ in cv.ops if op == "defect_params")
    cv.defect_input(threshold=30)
    cv.elapse(100)
    cv.defect_input(threshold=35)          # restarts the timer
    cv.elapse(200)
    assert sum(1 for op, _ in cv.ops if op == "defect_params") == n_def0
    cv.elapse(100)                          # 250 ms after the second input
    assert sum(1 for op, _ in cv.ops if op == "defect_params") == n_def0 + 1
    assert cv.ops[-2][0] == "defect_params"
    assert cv.ops[-1][0] == "auto_update_defect"
    assert cv.S["defect_params"]["threshold"] == 35

    # seg param debounce re-runs segmentation only because has_seg is set
    n_seg0 = sum(1 for op, _ in cv.ops if op == "run_segmentation")
    cv.seg_input(gaussian_blur=5)
    cv.elapse(400)
    assert sum(1 for op, _ in cv.ops if op == "run_segmentation") == n_seg0 + 1
    seg2 = SegmentationParams(**{k: cv.S["seg_params"][k]
                                 for k in cv.S["seg_params"]}).validated()
    assert seg2.gaussian_blur == 5

    # X/O inspection toggle: verdicts must equal the oracle flow on the
    # current parameters and exclusions
    r = cv.btn_inspect()
    assert cv.S["inspection_enabled"]
    ref_masks2, _, _ = oracle.segment_all_units(
        crops, seg2, exclusions=cv.S["exclusions"]
    )
    dp = DefectParams(**{k: cv.S["defect_params"][k]
                         for k in cv.S["defect_params"]}).validated()
    _, ref_areas, ref_verd = oracle.inspect_units(crops, ref_masks2, dp)
    assert r["ng"] == int(ref_verd.sum())
    assert cv.S["verdicts"] == [bool(v) for v in ref_verd]
    assert [int(a) for a in cv.S["areas"]] == [int(a) for a in ref_areas]

    # toggling off clears the X/O state
    cv.btn_inspect()
    assert not cv.S["inspection_enabled"]
