"""CLI alias: `python -m recalgorithm_tpu.cli.final_mlp` trains FinalMLP.

Beyond-reference model; same one-binary-per-model UX as the rest.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="FinalMLP")
