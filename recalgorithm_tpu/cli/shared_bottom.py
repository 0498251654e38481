"""CLI alias: `python -m recalgorithm_tpu.cli.shared_bottom` trains
SharedBottom (hard-parameter-sharing multi-task baseline; beyond reference).
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="SharedBottom")
