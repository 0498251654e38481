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
    p.add_argument("--variance_seeds", type=int, default=5,
                   help="rerun each model over N TRAINER seeds (param init "
                        "+ dropout vary; the data distribution stays fixed) "
                        "and set its band to clamp(3*sigma, 0.01, BAND_MAX) "
                        "— a band justified by measured rerun variance, not "
                        "a global guess")
    args = p.parse_args()
    names = (args.models.split(",") if args.models
             else sorted(set(MODEL_REGISTRY) - G.SKIP))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden_bands.json")
    goldens = {}
    if os.path.exists(path):
        with open(path) as f:
            goldens = json.load(f)

    # seed list: the canonical SEED first (its run IS the golden), then
    # variance-only reruns
    seeds = [G.SEED] + [101 + i for i in range(max(args.variance_seeds, 1) - 1)]

    import statistics

    violations = []
    for name in names:
        t0 = time.time()
        per_seed: list[dict[str, float]] = []
        for s in seeds:
            with tempfile.TemporaryDirectory() as tmp:
                per_seed.append(G.run_golden(name, tmp, seed=s))
        golden = {k: round(v, 5) for k, v in sorted(per_seed[0].items())}
        sigma = {
            k: (round(statistics.stdev(r[k] for r in per_seed), 5)
                if len(per_seed) > 1 else 0.0)
            for k in golden
        }
        band = {
            k: round(min(max(3 * sigma[k], 0.01), G.BAND_MAX), 5)
            for k in golden
        }
        goldens[name] = {"auc": golden, "band": band, "sigma": sigma,
                         "seeds": len(seeds)}
        print(f"{name}: auc={golden} sigma={sigma} band={band} "
              f"({time.time()-t0:.0f}s)", flush=True)
        for task, v in golden.items():
            # a band whose lower edge sits near 0.5 cannot distinguish a
            # dead (sigmoid-of-noise) model from a healthy one — flag it;
            # raise steps / tune LR in golden_common.PER_MODEL and rerun
            # just that model (incremental write keeps the rest)
            if v - band[task] < G.MIN_EDGE:
                violations.append((name, task, v, band[task]))
        # incremental write: an hour-long regen must not lose completed
        # models to a violation (or a crash) at the tail
        with open(path, "w") as f:
            json.dump(dict(sorted(goldens.items())), f, indent=1)

    print("wrote", path)
    if violations:
        for name, task, v, b in violations:
            print(f"EDGE VIOLATION {name}.{task}: golden {v:.5f} - band {b} "
                  f"< {G.MIN_EDGE} — tune PER_MODEL in tests/golden_common.py "
                  "and rerun with --models " + name)
        sys.exit(1)


if __name__ == "__main__":
    main()
