"""CLI alias: `python -m recalgorithm_tpu.cli.mmoe` trains MMOE.

Mirrors the reference's standalone `python mmoe.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="MMOE")
