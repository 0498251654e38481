"""Golden-band AUC regressions: every model, fixed seed, recorded band.

See tests/golden_common.py for rationale and tools/gen_golden_bands.py to
regenerate after deliberate model-math changes.
"""

import json
import os

import pytest

from tests import golden_common as G

_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_bands.json")
with open(_GOLDEN_PATH) as f:
    GOLDENS = json.load(f)


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden_band(name, tmp_path):
    aucs = G.run_golden(name, str(tmp_path))
    entry = GOLDENS[name]
    golden, bands = entry["auc"], entry["band"]
    assert set(aucs) == set(golden), (set(aucs), set(golden))
    for task, want in golden.items():
        got = aucs[task]
        band = bands.get(task, G.BAND)  # measured 3-sigma band per model
        sigma = entry.get("sigma", {}).get(task)
        assert abs(got - want) <= band, (
            f"{name}.{task}: AUC {got:.5f} left its golden band "
            f"{want:.5f} +/- {band} (clamp(3*sigma, 0.01, {G.BAND_MAX}) "
            f"with measured sigma={sigma} over {entry.get('seeds')} trainer "
            "seeds) — model math regressed (or the change was deliberate: "
            "regenerate with tools/gen_golden_bands.py)"
        )
        # the band's lower edge must always distinguish a live model from a
        # collapsed one — regression guard on the generator's invariant
        assert want - band >= G.MIN_EDGE, (name, task, want, band)
