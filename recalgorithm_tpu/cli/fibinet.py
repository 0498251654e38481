"""CLI alias: `python -m recalgorithm_tpu.cli.fibinet` trains FiBiNET.

Mirrors the reference's standalone `python fibinet.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="FiBiNET")
