"""CLI alias: `python -m recalgorithm_tpu.cli.masknet` trains MaskNet.

Beyond-reference model; same one-binary-per-model UX as the rest.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="MaskNet")
