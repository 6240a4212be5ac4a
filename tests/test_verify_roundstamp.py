"""tools/verify.py round-stamp logic (ADVICE r10 + VERDICT r10 item 5):
the TRACES_rN stamp must follow the workflow — current round by
default, the just-closed round under --round-start, an explicit pin
under --round.  Pure-function tests, no Spark."""

from __future__ import annotations

import importlib.util
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def _load_verify():
    spec = importlib.util.spec_from_file_location(
        "verify_mod", _REPO / "tools" / "verify.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_default_stamp_is_the_upcoming_round(monkeypatch):
    v = _load_verify()
    monkeypatch.setattr(v, "_closed_round", lambda: 10)
    assert v._trace_round(["verify.py"]) == 11


def test_round_start_stamps_the_just_closed_round(monkeypatch):
    v = _load_verify()
    monkeypatch.setattr(v, "_closed_round", lambda: 10)
    assert v._trace_round(["verify.py", "--round-start"]) == 10


def test_explicit_round_pin_wins(monkeypatch):
    v = _load_verify()
    monkeypatch.setattr(v, "_closed_round", lambda: 10)
    assert v._trace_round(["verify.py", "--round", "7"]) == 7
    # explicit pin beats --round-start when both are (mis)passed
    assert v._trace_round(["verify.py", "--round", "7", "--round-start"]) == 7


def test_closed_round_reads_the_repo_artifacts():
    """On the real repo the closed round is >= 10 (CORRECTNESS_r01..r10
    exist) and the default stamp is one above it."""
    v = _load_verify()
    closed = v._closed_round()
    assert closed >= 10
    assert v._trace_round(["verify.py"]) == closed + 1
