"""CLI alias: `python -m recalgorithm_tpu.cli.ffm` trains FFM.

Mirrors the reference's standalone `python ffm.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="FFM")
