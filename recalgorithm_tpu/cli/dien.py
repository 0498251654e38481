"""CLI alias: `python -m recalgorithm_tpu.cli.dien` trains DIEN.

Mirrors the reference's standalone `python dien.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="DIEN")
