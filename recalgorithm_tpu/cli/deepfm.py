"""CLI alias: `python -m recalgorithm_tpu.cli.deepfm` trains DeepFM.

Mirrors the reference's standalone `python deepfm.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="DeepFM")
