"""CLI alias: `python -m recalgorithm_tpu.cli.nfm` trains NFM.

Mirrors the reference's standalone `python nfm.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="NFM")
