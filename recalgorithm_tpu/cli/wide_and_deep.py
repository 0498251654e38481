"""CLI alias: `python -m recalgorithm_tpu.cli.wide_and_deep` trains WideAndDeep.

Mirrors the reference's standalone `python wide_and_deep.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="WideAndDeep")
