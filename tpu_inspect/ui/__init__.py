"""Thin interactive web client over the headless engine (SURVEY.md §7
stage 8): the reference tool's canvas/controls workflow
(indexing_ui.py:565-1014) served as a single-page app by a stdlib HTTP
server. All state lives in one InspectionSession; the browser is a view."""

from tpu_inspect.ui.server import UIServer

__all__ = ["UIServer"]
