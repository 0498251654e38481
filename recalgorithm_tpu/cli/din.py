"""CLI alias: `python -m recalgorithm_tpu.cli.din` trains DIN.

Mirrors the reference's standalone `python din.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="DIN")
