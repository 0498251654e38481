"""CLI alias: `python -m recalgorithm_tpu.cli.two_tower` trains TwoTower.

Beyond-reference retrieval model (no reference counterpart; the reference
zoo is ranking-only).
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="TwoTower")
