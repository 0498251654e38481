"""CLI alias: `python -m recalgorithm_tpu.cli.bst` trains BST.

Mirrors the reference's standalone `python bst.py --flags` entrypoint.
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="BST")
