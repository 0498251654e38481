"""CLI alias: `python -m recalgorithm_tpu.cli.esmm` trains ESMM.

Mirrors the reference's standalone `python esmm.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="ESMM")
