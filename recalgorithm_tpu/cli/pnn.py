"""CLI alias: `python -m recalgorithm_tpu.cli.pnn` trains PNN.

Mirrors the reference's standalone `python pnn.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="PNN")
