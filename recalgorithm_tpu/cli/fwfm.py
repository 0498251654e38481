"""CLI alias: `python -m recalgorithm_tpu.cli.fwfm` trains FwFM.

Mirrors the reference's standalone `python fwfm.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="FwFM")
