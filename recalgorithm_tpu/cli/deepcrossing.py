"""CLI alias: `python -m recalgorithm_tpu.cli.deepcrossing` trains DeepCrossing.

Mirrors the reference's standalone `python deepcrossing.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="DeepCrossing")
