"""The value-sweep float gate must be machine-decidable AND still
catch real defects.

The driver's hash gate rounds floats at 6dp ABSOLUTE — structurally
unsatisfiable between two engines once sums reach ~1e10 (it demands
~1e-16 relative agreement, below double accumulation noise). The gate
in scripts/value_sweep.py therefore passes a float cell on
(6dp-absolute OR relative <= FLOAT_RTOL=1e-9) while keeping
rows/schema/non-float strict. These tests pin both directions:
accumulation-order noise passes without hand adjudication, and a
planted 1e-7 relative defect — three decades above noise, four below
the old absolute writeoff — still fails.
"""

import importlib.util
import os

import pandas as pd
import pytest

_SWEEP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "value_sweep.py",
)
spec = importlib.util.spec_from_file_location("value_sweep", _SWEEP)
value_sweep = importlib.util.module_from_spec(spec)
spec.loader.exec_module(spec and value_sweep)

_adjudicate = value_sweep._adjudicate


def _frames(base, perturbed):
    s = pd.DataFrame({"k": ["a", "b"], "v": base})
    o = pd.DataFrame({"k": ["a", "b"], "v": perturbed})
    return s, o


def test_accumulation_noise_at_large_magnitude_passes():
    # 1e-12 relative at 1e10 magnitude = 1e-2 absolute: the 6dp hash
    # gate fails, the relative gate passes — the sf1 sweep's entire
    # observed failure class (max 3.95e-12).
    s, o = _frames([1.0e10, 2.0], [1.0e10 * (1 + 1e-12), 2.0])
    rec = _adjudicate(s, o)
    assert rec["float_gate_pass"]
    assert rec["non_float_mismatches"] == 0


def test_planted_1e7_relative_defect_fails():
    # A real 1e-7 defect at large magnitude must NOT hide inside the
    # "expected float noise" writeoff.
    s, o = _frames([1.0e10, 2.0], [1.0e10 * (1 + 1e-7), 2.0])
    rec = _adjudicate(s, o)
    assert not rec["float_gate_pass"]
    assert rec["float_gate_fail_cells"] == 1


def test_small_magnitude_passes_on_absolute_gate():
    # Near-zero cells blow up relative error but sit inside the hash's
    # own 6dp resolution — the absolute arm of the OR covers them
    # (events_windowed_agg's avg_value at sf0.1: rel 2.3e-8, abs ~1e-9).
    s, o = _frames([0.02, 2.0], [0.02 + 4.6e-10, 2.0])
    rec = _adjudicate(s, o)
    assert rec["float_gate_pass"]


def test_small_magnitude_absolute_defect_fails():
    # ...but a visible-at-6dp absolute defect on a small value fails
    # both arms.
    s, o = _frames([0.02, 2.0], [0.021, 2.0])
    rec = _adjudicate(s, o)
    assert not rec["float_gate_pass"]


def test_non_float_mismatch_is_strict():
    s = pd.DataFrame({"k": ["a", "b"], "v": [1.0, 2.0]})
    o = pd.DataFrame({"k": ["a", "X"], "v": [1.0, 2.0]})
    rec = _adjudicate(s, o)
    assert not rec["float_gate_pass"]
    assert rec["non_float_mismatches"] >= 1


def test_null_representation_skew_is_not_a_mismatch():
    # Spark None vs DuckDB NaN both mean NULL.
    s = pd.DataFrame({"k": ["a", None], "v": [1.0, 2.0]})
    o = pd.DataFrame({"k": ["a", float("nan")], "v": [1.0, 2.0]})
    rec = _adjudicate(s, o)
    assert rec["float_gate_pass"]


@pytest.mark.parametrize("rel", [1e-10, 9.9e-10])
def test_rtol_boundary_passes_below(rel):
    s, o = _frames([1.0e10, 2.0], [1.0e10 * (1 + rel), 2.0])
    assert _adjudicate(s, o)["float_gate_pass"]


@pytest.mark.parametrize("rel", [1.1e-9, 1e-8])
def test_rtol_boundary_fails_above(rel):
    s, o = _frames([1.0e10, 2.0], [1.0e10 * (1 + rel), 2.0])
    assert not _adjudicate(s, o)["float_gate_pass"]


def test_boundary_tie_single_quantum_passes():
    # the true value sits exactly on the 5e-7 rounding boundary: the
    # two engines' accumulation noise splits it into adjacent 6dp
    # values — one full quantum apart, information-theoretically
    # undecidable from rounded output (observed on avg_value at sf10).
    s, o = _frames([40.054688, 2.0], [40.054687, 2.0])
    rec = _adjudicate(s, o)
    assert rec["float_gate_pass"]
    assert rec["boundary_tie_cells"] == 1


def test_two_quantum_shift_fails():
    s, o = _frames([40.054689, 2.0], [40.054687, 2.0])
    rec = _adjudicate(s, o)
    assert not rec["float_gate_pass"]


def test_systematic_one_quantum_defect_fails_via_cap():
    # >2% of a column's rows shifted by one quantum is a defect
    # signature, not boundary physics
    import pandas as pd

    n = 100
    base = [round(10.0 + i * 0.001, 6) for i in range(n)]
    shifted = [round(v + 1e-6, 6) for v in base[:5]] + base[5:]
    s = pd.DataFrame({"k": list(range(n)), "v": shifted})
    o = pd.DataFrame({"k": list(range(n)), "v": base})
    rec = _adjudicate(s, o)
    assert not rec["float_gate_pass"]
    assert rec["float_gate_fail_cells"] == 5


def test_row_alignment_sorts_non_float_keys_first():
    # two rows whose float column differs in the last ulp must pair by
    # their non-float key, not by float sort order (which would swap
    # them on one side and fabricate large cell differences)
    import pandas as pd

    s = pd.DataFrame({"k": ["a", "b"], "v": [1.0000000001, 1.0]})
    o = pd.DataFrame({"k": ["a", "b"], "v": [1.0, 1.0000000002]})
    rec = _adjudicate(s, o)
    assert rec["float_gate_pass"]  # each pair differs by ~1e-10 rel
