"""Native C++ windowing engine: bit-identical to the numpy reference path."""

import numpy as np
import pytest

try:
    from grouptraj.data import _native
except ImportError:
    _native = None

from grouptraj.data.reader import load_dir

pytestmark = pytest.mark.skipif(_native is None,
                                reason="native extension unavailable")


def test_native_matches_python_on_fixture(tiny_dataset_dir):
    py = load_dir(tiny_dataset_dir, use_native=False)
    cc = load_dir(tiny_dataset_dir, use_native=True)
    assert len(py) == len(cc) > 0
    for a, b in zip(py, cc):
        assert a.num_peds == b.num_peds
        np.testing.assert_array_equal(a.xy, b.xy)
        np.testing.assert_array_equal(a.rel, b.rel)
        np.testing.assert_array_equal(a.group, b.group)
        np.testing.assert_array_equal(a.non_linear, b.non_linear)


def test_native_group_required(tmp_path):
    p = tmp_path / "four_col.txt"
    rows = []
    for t in range(25):
        for ped in (1, 2):
            rows.append(f"{t*10.0}\t{ped}.0\t{0.1*t}\t{0.2*t}")
    p.write_text("\n".join(rows) + "\n")
    with pytest.raises(AssertionError):
        _native.extract_windows_file(str(p), group_required=True)
    ws = _native.extract_windows_file(str(p), group_required=False)
    assert len(ws) == 6 and np.all(ws[0].group == 0)


def test_native_rounding_half_even(tmp_path):
    """np.around half-even semantics must match (e.g. 0.00005 -> 0.0)."""
    p = tmp_path / "round.txt"
    rows = []
    for t in range(20):
        for ped in (1, 2):
            # values straddling the 4-decimal rounding boundary
            x = t * 0.1 + 0.00005
            rows.append(f"{t*10.0}\t{ped}.0\t{x}\t{0.00015}\t1.0")
    p.write_text("\n".join(rows) + "\n")
    py = load_dir(str(tmp_path), use_native=False)
    cc = load_dir(str(tmp_path), use_native=True)
    for a, b in zip(py, cc):
        np.testing.assert_array_equal(a.xy, b.xy)
        np.testing.assert_array_equal(a.rel, b.rel)
