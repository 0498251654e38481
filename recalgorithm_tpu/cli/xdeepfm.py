"""CLI alias: `python -m recalgorithm_tpu.cli.xdeepfm` trains xDeepFM.

Mirrors the reference's standalone `python xdeepfm.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="xDeepFM")
