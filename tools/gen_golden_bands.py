"""Regenerate tests/golden_bands.json (fixed-seed per-model AUC goldens).

Run on the CPU backend (the same one CI uses):
    JAX_PLATFORMS=cpu python tools/gen_golden_bands.py [--models A,B]

Re-run whenever a deliberate change to model math / init / optimizer moves a
model outside its band; commit the refreshed file with the change that
caused it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from recalgorithm_tpu.models import MODEL_REGISTRY
    from tests import golden_common as G

    p = argparse.ArgumentParser()
    p.add_argument("--models", default=None)
    args = p.parse_args()
    names = (args.models.split(",") if args.models
             else sorted(set(MODEL_REGISTRY) - G.SKIP))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden_bands.json")
    goldens = {}
    if os.path.exists(path):
        with open(path) as f:
            goldens = json.load(f)

    for name in names:
        t0 = time.time()
        with tempfile.TemporaryDirectory() as tmp:
            aucs = G.run_golden(name, tmp)
        goldens[name] = {k: round(v, 5) for k, v in sorted(aucs.items())}
        print(f"{name}: {goldens[name]} ({time.time()-t0:.0f}s)", flush=True)
        for task, v in goldens[name].items():
            # a band whose lower edge sits at ~0.5 cannot distinguish a
            # dead (sigmoid-of-noise) model from a healthy one — refuse to
            # write it; raise steps / tune LR in golden_common.PER_MODEL
            assert v - G.BAND >= 0.55, (
                f"{name}.{task}: golden {v:.5f} - band {G.BAND} < 0.55 — "
                "this band would accept a collapsed model (AUC 0.5). "
                "Tune PER_MODEL in tests/golden_common.py first."
            )

    with open(path, "w") as f:
        json.dump(dict(sorted(goldens.items())), f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
