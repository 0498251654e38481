"""CLI alias: `python -m recalgorithm_tpu.cli.ple` trains PLE.

Mirrors the reference's standalone `python ple.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="PLE")
