"""CLI alias: `python -m recalgorithm_tpu.cli.afm` trains AFM.

Mirrors the reference's standalone `python afm.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="AFM")
