"""ctypes binding for the native C++ windowing engine (native/windowing.cpp).

Builds the shared library on first use if g++ is available (cached next to
this module); importing raises if neither the library nor a compiler exists,
and :mod:`grouptraj.data.reader` then falls back to the numpy path. Both
paths are tested identical on real ETH/UCY files.

One deliberate divergence: rows with non-numeric tokens are skipped by the
native parser (robustness) where the numpy path raises ValueError like the
reference; well-formed files are bit-identical.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_REPO, "native", "windowing.cpp")
_LIB = os.path.join(_HERE, "_windowing.so")


def _build() -> None:
    if not os.path.exists(_SRC):
        raise ImportError(f"native source missing: {_SRC}")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise ImportError(f"native build failed: {detail}")


if not os.path.exists(_LIB) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
    _build()

_lib = ctypes.CDLL(_LIB)
_lib.gt_load_file.restype = ctypes.c_void_p
_lib.gt_load_file.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_double, ctypes.c_int, ctypes.c_int]
_lib.gt_num_windows.argtypes = [ctypes.c_void_p]
_lib.gt_window_peds.argtypes = [ctypes.c_void_p, ctypes.c_int]
_lib.gt_copy_window.argtypes = [ctypes.c_void_p, ctypes.c_int] + \
    [np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")] * 4
_lib.gt_free.argtypes = [ctypes.c_void_p]


def extract_windows_file(path: str, obs_len: int = 8, pred_len: int = 12,
                         skip: int = 1, threshold: float = 0.002,
                         min_ped: int = 1, group_required: bool = True
                         ) -> List["RawWindow"]:
    from grouptraj.data.reader import RawWindow

    h = _lib.gt_load_file(path.encode(), obs_len, pred_len, skip, threshold,
                          min_ped, int(group_required))
    if not h:
        if group_required:
            # distinguish missing-labels from unreadable file like the
            # Python path does
            with open(path, "r") as f:
                first = f.readline().strip()
            if first and len(first.replace("\t", " ").split()) < 5:
                raise AssertionError("dataset has no labeling")
        raise IOError(f"native loader failed on {path}")
    try:
        seq_len = obs_len + pred_len
        out: List[RawWindow] = []
        for i in range(_lib.gt_num_windows(h)):
            n = _lib.gt_window_peds(h, i)
            xy = np.empty((n, seq_len, 2), np.float32)
            rel = np.empty((n, seq_len, 2), np.float32)
            group = np.empty((n, seq_len), np.float32)
            nonlin = np.empty((n,), np.float32)
            _lib.gt_copy_window(h, i, xy, rel, group, nonlin)
            out.append(RawWindow(
                xy=xy, rel=rel, group=group, non_linear=nonlin,
                loss_mask=np.ones((n, seq_len), np.float32)))
        return out
    finally:
        _lib.gt_free(h)
