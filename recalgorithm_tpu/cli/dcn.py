"""CLI alias: `python -m recalgorithm_tpu.cli.dcn` trains DCN.

Mirrors the reference's standalone `python dcn.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="DCN")
